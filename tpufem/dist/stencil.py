"""Distributed stencil SpMV: halo exchange over the device mesh.

Each shard owns a contiguous row stripe of the offset-diagonal matrix
``data [K, NN/P]`` and of the vector ``x [NN/P]``.  A matvec needs at most
``halo = max |offset|`` neighbor values on each side: one ``ppermute`` per
direction moves exactly those boundary DOFs between ring neighbors (the ICI
-friendly pattern SURVEY.md §2.4 calls for — the structural analogue of ring
attention's neighbor passing), then the local matvec proceeds with static
shifts exactly like the single-chip kernel.

Communication volume per matvec: 2 * halo values per shard boundary —
independent of problem size per chip, so weak scaling is flat.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["halo_exchange", "sharded_stencil_matvec"]


def halo_exchange(x_local, halo: int, axis_name: str):
    """Return (left_halo [halo], right_halo [halo]) from ring neighbors.

    Global-boundary shards receive zeros (matching the zero padding of the
    single-chip matvec).
    """
    idx = jax.lax.axis_index(axis_name)
    p = jax.lax.axis_size(axis_name)
    # my first `halo` values are my LEFT neighbor's right halo
    to_left = x_local[:halo]
    # my last `halo` values are my RIGHT neighbor's left halo
    to_right = x_local[-halo:]
    right_halo = jax.lax.ppermute(
        to_left, axis_name, [(i, (i - 1) % p) for i in range(p)])
    left_halo = jax.lax.ppermute(
        to_right, axis_name, [(i, (i + 1) % p) for i in range(p)])
    left_halo = jnp.where(idx == 0, jnp.zeros_like(left_halo), left_halo)
    right_halo = jnp.where(idx == p - 1, jnp.zeros_like(right_halo),
                           right_halo)
    return left_halo, right_halo


def sharded_stencil_matvec(data_local, x_local, offsets, axis_name: str):
    """Local stripe of y = A x. data_local [K, NL], x_local [NL]."""
    nl = x_local.shape[0]
    halo = int(max(abs(int(o)) for o in offsets))
    left, right = halo_exchange(x_local, halo, axis_name)
    xp = jnp.concatenate([left, x_local, right])
    y = jnp.zeros_like(x_local)
    for k, off in enumerate(offsets):
        shifted = jax.lax.dynamic_slice(xp, (halo + int(off),), (nl,))
        y = y + data_local[k] * shifted
    return y
