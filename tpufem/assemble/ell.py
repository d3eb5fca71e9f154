"""ELL global assembly with precomputed slots — no search, no atomics.

The reference's ELL kernel linear-searches the column slot per entry and then
atomicAdds (/root/reference/fea_test_sm_sym_sparse2.cu:273-282).  Here the
slot of every local-matrix entry is precomputed once on the host
(tpufem.mesh.adjacency.ell_pattern), and the device does one of two
deterministic reductions:

  * ``method="scatter"``: a single flat scatter-add with the precomputed slot
    indices — XLA lowers this to an efficient sort-based scatter;
  * ``method="sort"``: gather-by-permutation + sorted ``segment_sum``, the
    fully explicit TPU pipeline (best when reusing the permutation across
    many assemblies, e.g. time stepping / Newton iterations).

Both produce bit-identical results given the same summation order is
deterministic (unlike CUDA atomics, whose float addition order is
nondeterministic run to run).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpufem.mesh.adjacency import ELLPattern
from tpufem.sparse.ell import ELLMatrix

__all__ = ["assemble_ell", "ell_values", "ell_values_scatter"]


def ell_values_scatter(slots, element_matrices, num_rows: int, width: int):
    """Functional core of ``ell_values(method="scatter")``.

    Takes the flat slot indices as an ARRAY argument instead of reading
    them off an :class:`ELLPattern`, so a jitted assembly can receive the
    scatter plan as a runtime parameter — closure-capturing the plan bakes
    ~70 MB of constants into the HLO at 2M elements (BENCH_NOTES r4).
    """
    vals = element_matrices.reshape(-1)
    flat = jnp.zeros(num_rows * width, vals.dtype).at[
        slots.reshape(-1)].add(vals)
    return flat.reshape(num_rows, width)


def ell_values(pattern: ELLPattern, element_matrices, method: str = "scatter"):
    """Reduce local matrices into the flat ELL value array [NN * K]."""
    num_rows, width = pattern.cols.shape
    vals = element_matrices.reshape(-1)
    if method == "scatter":
        slots = jnp.asarray(pattern.slots.reshape(-1))
        flat = jnp.zeros(num_rows * width, vals.dtype).at[slots].add(vals)
    elif method == "sort":
        perm = jnp.asarray(pattern.perm)
        seg = jnp.asarray(pattern.sorted_slots)
        flat = jax.ops.segment_sum(
            vals[perm], seg, num_segments=num_rows * width,
            indices_are_sorted=True)
    else:
        raise ValueError(f"unknown assembly method {method!r}")
    return flat.reshape(num_rows, width)


def assemble_ell(pattern: ELLPattern, element_matrices,
                 method: str = "scatter") -> ELLMatrix:
    """Local matrices [NE, n, n] -> ELLMatrix on the pattern."""
    data = ell_values(pattern, element_matrices, method=method)
    return ELLMatrix(
        data=data,
        cols=jnp.asarray(pattern.cols),
        row_lengths=jnp.asarray(pattern.row_lengths),
        diag_pos=jnp.asarray(pattern.diag_pos),
    )
