"""Row partitioning for distributed operators.

The reference is single-GPU/single-process (MPI appears only as a PBS
launcher, /root/reference/job.pbs:26; SURVEY.md §2.4) — multi-chip scaling is
a new, first-class subsystem here.  Rows (mesh nodes / DOFs) are partitioned
into P contiguous stripes; for the row-major structured meshes this makes
stripe boundaries mesh rows, so the stencil halo is exactly the inter-stripe
coupling and rides the ICI ring between neighbor chips.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pad_rows", "padded_size"]


def padded_size(n: int, num_shards: int) -> int:
    return ((n + num_shards - 1) // num_shards) * num_shards


def pad_rows(data, b, offsets, num_shards: int, diag_k: int):
    """Pad a stencil system to a multiple of num_shards rows.

    Padding rows are identity (diag = 1, rhs = 0) so they stay decoupled and
    exactly preserve the CG trajectory of the unpadded system.
    Returns (data_p [K, NP], b_p [NP], n_orig).
    """
    k, n = data.shape
    np_rows = padded_size(n, num_shards)
    if np_rows == n:
        return data, b, n
    pad = np_rows - n
    data_p = jnp.pad(data, ((0, 0), (0, pad)))
    data_p = data_p.at[diag_k, n:].set(1.0)
    b_p = jnp.pad(b, (0, pad))
    return data_p, b_p, n
