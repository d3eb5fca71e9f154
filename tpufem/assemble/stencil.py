"""Assembly into stencil (offset-diagonal) storage."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufem.sparse.stencil import StencilMatrix, StencilPattern

__all__ = ["assemble_stencil", "stencil_values"]


def stencil_values(pattern: StencilPattern, element_matrices,
                   method: str = "scatter"):
    """Local matrices -> stencil data [K, NN] (scatter or sorted segment-sum,
    same deterministic reductions as the ELL path)."""
    k, n = pattern.width, pattern.num_rows
    vals = element_matrices.reshape(-1)
    if method == "scatter":
        slots = jnp.asarray(pattern.slots.reshape(-1))
        flat = jnp.zeros(k * n, vals.dtype).at[slots].add(vals)
    elif method == "sort":
        perm = jnp.asarray(pattern.perm)
        seg = jnp.asarray(pattern.sorted_slots)
        flat = jax.ops.segment_sum(vals[perm], seg, num_segments=k * n,
                                   indices_are_sorted=True)
    else:
        raise ValueError(f"unknown assembly method {method!r}")
    return flat.reshape(k, n)


def assemble_stencil(pattern: StencilPattern, element_matrices,
                     method: str = "scatter") -> StencilMatrix:
    data = stencil_values(pattern, element_matrices, method=method)
    return StencilMatrix(data, pattern.offsets)
