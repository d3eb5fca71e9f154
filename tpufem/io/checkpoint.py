"""Checkpoint / resume: save assembled systems and warm-restart CG.

The reference has no persistence at all (programs run seconds and print to
stdout — SURVEY.md §5).  Here: assembled operators, RHS vectors, and solver
iterates round-trip through compressed npz (dependency-free), and CG resumes
from a checkpointed iterate (tpufem.solve.cg.cg accepts x0).  An orbax-backed
variant is provided when orbax is importable (it is in the TPU image), for
async / sharded checkpoints of large runs.
"""
from __future__ import annotations

import os
import numpy as np

import jax.numpy as jnp

from tpufem.sparse.ell import ELLMatrix
from tpufem.sparse.stencil import StencilMatrix

__all__ = ["save_system", "load_system", "save_solution", "load_solution",
           "orbax_save", "orbax_restore"]

_KINDS = {"ell": ELLMatrix, "stencil": StencilMatrix}


def save_system(path: str, A, b=None, **extra) -> None:
    """Save an assembled system (ELL or Stencil matrix + optional RHS)."""
    arrays = {}
    if isinstance(A, ELLMatrix):
        arrays["kind"] = np.array("ell")
        arrays["data"] = np.asarray(A.data)
        arrays["cols"] = np.asarray(A.cols)
        if A.row_lengths is not None:
            arrays["row_lengths"] = np.asarray(A.row_lengths)
        if A.diag_pos is not None:
            arrays["diag_pos"] = np.asarray(A.diag_pos)
    elif isinstance(A, StencilMatrix):
        arrays["kind"] = np.array("stencil")
        arrays["data"] = np.asarray(A.data)
        arrays["offsets"] = np.asarray(A.offsets, dtype=np.int64)
    else:
        raise TypeError(f"unsupported matrix type {type(A)}")
    if b is not None:
        arrays["b"] = np.asarray(b)
    for k, v in extra.items():
        arrays[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_system(path: str):
    """Load (A, b, extras) saved by save_system."""
    with np.load(path, allow_pickle=False) as z:
        kind = str(z["kind"])
        if kind == "ell":
            A = ELLMatrix(
                jnp.asarray(z["data"]), jnp.asarray(z["cols"]),
                jnp.asarray(z["row_lengths"]) if "row_lengths" in z else None,
                jnp.asarray(z["diag_pos"]) if "diag_pos" in z else None)
        elif kind == "stencil":
            A = StencilMatrix(jnp.asarray(z["data"]),
                              tuple(int(o) for o in z["offsets"]))
        else:
            raise ValueError(f"unknown matrix kind {kind!r}")
        b = jnp.asarray(z["b"]) if "b" in z else None
        extras = {k[6:]: np.asarray(z[k]) for k in z.files
                  if k.startswith("extra_")}
    return A, b, extras


def save_solution(path: str, x, *, iterations: int = 0,
                  residual_norm: float = 0.0, **extra) -> None:
    """Save a solver iterate for warm restart (CG resumes via x0)."""
    arrays = {"x": np.asarray(x),
              "iterations": np.asarray(iterations),
              "residual_norm": np.asarray(residual_norm)}
    for k, v in extra.items():
        arrays[f"extra_{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **arrays)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load_solution(path: str):
    with np.load(path, allow_pickle=False) as z:
        x = jnp.asarray(z["x"])
        info = {"iterations": int(z["iterations"]),
                "residual_norm": float(z["residual_norm"])}
        info.update({k[6:]: np.asarray(z[k]) for k in z.files
                     if k.startswith("extra_")})
    return x, info


# -- orbax variant (async / sharded checkpoints of large runs) ---------------

def orbax_save(path: str, pytree) -> None:
    """Checkpoint an arbitrary jax pytree with orbax (preserves shardings;
    the right choice for multi-chip state like MG hierarchies or distributed
    CG iterates)."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), pytree, force=True)


def orbax_restore(path: str, reference_pytree=None):
    """Restore a pytree saved by orbax_save.  ``reference_pytree`` (abstract
    shapes or a matching example) restores with the original structure and
    target shardings."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if reference_pytree is not None:
            return ckptr.restore(os.path.abspath(path), reference_pytree)
        return ckptr.restore(os.path.abspath(path))
