"""COO-triplet assembly: the sort + segment-sum replacement for atomicAdd.

The reference's COO variant emits 9 raw (row, col, val) triplets per element
with plain stores and leaves duplicate summation to a host step that does not
exist (/root/reference/fea_test_sm_sym_sparse.cu:244-254; SURVEY.md §2.5.3).
Here the triplet emission is the same bandwidth-bound shape, but the
reduction actually happens — deterministically, on device:

  1. ``coo_triplets``      — raw triplets (parity with the reference output);
  2. ``coo_sum_duplicates``— device sort-by-key + sorted ``segment_sum`` into
                             the precomputed unique pattern (no atomics);
  3. ``assemble_coo``      — end-to-end: local matrices -> deduplicated
                             values aligned with an ELLPattern.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["coo_triplets", "coo_sum_duplicates", "assemble_coo"]


def coo_triplets(dof_conn, element_matrices):
    """Raw (rows, cols, vals) with duplicates, one triplet per local entry.

    Parity with the reference kernel's triplet stores
    (/root/reference/fea_test_sm_sym_sparse.cu:244-254), order included:
    entry (e, i, j) lands at flat position e*n*n + i*n + j.
    """
    conn = jnp.asarray(dof_conn)
    n = conn.shape[1]
    rows = jnp.repeat(conn, n, axis=1).reshape(-1)
    cols = jnp.tile(conn, (1, n)).reshape(-1)
    vals = element_matrices.reshape(-1)
    return rows, cols, vals


def coo_sum_duplicates(rows, cols, vals, unique_keys, num_dofs: int):
    """Sum duplicate (row, col) entries into the unique sparsity pattern.

    unique_keys: [nnz] int64 sorted keys row*num_dofs+col (host-precomputed,
    static).  Returns deduplicated values [nnz] aligned with unique_keys.

    Pure device path: binary-search each triplet's key into the pattern, then
    a segment-sum — the canonical TPU scatter-add (SURVEY.md §2.2
    "Global assembly — COO triplets").
    """
    keys = rows.astype(jnp.int64) * num_dofs + cols.astype(jnp.int64)
    seg = jnp.searchsorted(jnp.asarray(unique_keys), keys).astype(jnp.int32)
    return jax.ops.segment_sum(vals, seg, num_segments=int(unique_keys.shape[0]))


def assemble_coo(dof_conn, element_matrices, unique_keys, num_dofs: int):
    """Local matrices -> deduplicated COO values aligned with unique_keys."""
    rows, cols, vals = coo_triplets(dof_conn, element_matrices)
    return coo_sum_duplicates(rows, cols, vals, unique_keys, num_dofs)
