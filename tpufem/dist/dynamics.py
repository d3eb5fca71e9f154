"""Distributed explicit dynamics: sharded leapfrog over a device mesh.

Multi-chip version of :mod:`tpufem.solve.dynamics` — the reference has no
time integration at all (static assembly only, SURVEY.md §0) and no
multi-GPU layer beyond its single-device launches.  Here the WHOLE time
loop — lax.scan of central-difference steps — runs inside one
``jax.shard_map`` over a row-striped mesh:

  * each step's stiffness SpMV is the single-hop halo-exchange stencil
    matvec (dist.stencil.sharded_stencil_matvec) — neighbor ``ppermute``
    traffic only, no all-gathers;
  * the discrete-energy trace needs two global dots per step, which XLA
    lowers to ``psum`` ICI collectives;
  * everything else (mass scaling, BC masking, the three-term update) is
    shard-local elementwise work.

Numerics are IDENTICAL to the single-device leapfrog (same start-up,
same carried-SpMV energy identity): tests/test_dist.py pins sharded ==
unsharded trajectories and the ~1e-12 fp64 energy drift.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpufem.dist.stencil import sharded_stencil_matvec

__all__ = ["leapfrog_wave_sharded"]


class _ShardedWaveResult(NamedTuple):
    u: jax.Array          # [NN] displacement at t = steps*dt (sharded)
    v: jax.Array          # [NN] midpoint velocity
    energy: jax.Array     # [steps-1] discrete energy trace (replicated)


def _pdot(a, b, axis_name):
    return jax.lax.psum(jnp.vdot(a, b), axis_name)


def leapfrog_wave_sharded(data, offsets, m_lumped, u0, v0, dt: float,
                          steps: int, mesh: Mesh, *,
                          axis_name: str = "rows",
                          bc_mask=None) -> _ShardedWaveResult:
    """Integrate M u'' + K u = 0 with central differences over ``mesh``.

    ``data`` [K, NN] stencil values / ``offsets``: the stiffness operator
    in stencil form (row count divisible by the mesh axis — use
    dist.partition.pad_rows; padding rows must carry zero stencil values
    and unit mass).  ``m_lumped``/``u0``/``v0``/``bc_mask``: [NN].
    Exactly the single-device scheme of solve.dynamics.leapfrog_wave:
    Taylor start-up, K u_n carried so each step pays ONE SpMV, discrete
    energy E_{n+1/2} = 1/2 v^T M v + 1/2 u_n^T K u_{n+1} traced per step.
    """
    offsets = tuple(int(o) for o in offsets)
    num = mesh.shape[axis_name]
    n = u0.shape[0]
    if n % num:
        raise ValueError(f"rows {n} not divisible by mesh axis {num}; "
                         "pad with tpufem.dist.partition.pad_rows")
    halo = max(abs(o) for o in offsets)
    if n // num < halo:
        raise ValueError(
            f"local stripe ({n // num} rows) thinner than the stencil "
            f"halo ({halo}) — use fewer shards or a larger mesh")
    dt = float(dt)
    steps = int(steps)
    dtype = m_lumped.dtype
    if bc_mask is None:
        bc_mask = jnp.zeros(n, bool)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(axis_name), P()))
    def run(data_l, mL_l, u_l, v_l, bc_l):
        inv_m = 1.0 / mL_l
        zero = jnp.zeros((), dtype)

        def matvec(u):
            return sharded_stencil_matvec(data_l, u, offsets, axis_name)

        def proj(x):
            return jnp.where(bc_l, zero, x)

        u = proj(jnp.asarray(u_l, dtype))
        v = proj(jnp.asarray(v_l, dtype))
        a0 = proj(-inv_m * matvec(u))
        u1 = proj(u + dt * v + 0.5 * dt * dt * a0)
        Ku1 = matvec(u1)

        def step(carry, _):
            u_prev, u_c, Ku = carry
            u_next = proj(2.0 * u_c - u_prev - dt * dt * (inv_m * Ku))
            Ku_next = matvec(u_next)
            v_half = (u_next - u_c) / dt
            energy = (0.5 * _pdot(v_half, mL_l * v_half, axis_name)
                      + 0.5 * _pdot(u_c, Ku_next, axis_name))
            return (u_c, u_next, Ku_next), energy

        (u_pf, u_f, _), energy = jax.lax.scan(
            step, (u, u1, Ku1), None, length=steps - 1)
        v_f = (u_f - u_pf) / dt
        return u_f, v_f, energy

    u_f, v_f, energy = run(data, m_lumped, u0, v0, bc_mask)
    return _ShardedWaveResult(u=u_f, v=v_f, energy=energy)
