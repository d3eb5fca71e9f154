"""2D pod-shaped decomposition for structured grid stencils.

Round-2's distributed layer was 1D-only (contiguous z-plane stripes —
``dist/stencil.py``, ``dist/multigrid.py``); real TPU pods expose a 2D/3D
ICI torus, so weak-scaling past a handful of chips wants a 2D device mesh
("z", "y") with the grid sharded over both leading axes (VERDICT.md r2
item 10).  Halo exchange is the standard two-phase scheme:

  phase 1:  exchange single z-planes with the "z"-ring neighbors;
  phase 2:  exchange single y-rows of the *z-extended* block with the
            "y"-ring neighbors — the z-halo rows ride along, so corner
            values (offsets with dz != 0 and dy != 0) arrive transitively
            without any diagonal-neighbor communication.

Per-matvec communication: 2 z-planes + 2 y-rows per shard — surface terms,
independent of the local volume, so weak scaling stays flat on both mesh
axes.  All collectives are ``ppermute`` (ICI neighbor transfers) plus
``psum`` for the CG dot products, exactly the XLA-collective design
SURVEY.md §2.4 prescribes.  No counterpart exists in the reference (it is
single-GPU; /root/reference/job.pbs:26 uses MPI only as a launcher).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.solve.cg import CGResult

__all__ = ["halo_exchange_grid", "grid_stencil_matvec_2d",
           "grid_cg_sharded_2d", "solve_grid_cg_2d"]


def _axis_halo(x, axis_name: str, axis: int):
    """(low, high) single-slab halos of ``x`` along array axis ``axis``
    from the ``axis_name`` ring; global-boundary shards receive zeros."""
    lo_slab = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    hi_slab = jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                                   axis=axis)
    idx = jax.lax.axis_index(axis_name)
    p = jax.lax.axis_size(axis_name)
    zero = jnp.zeros_like(lo_slab)
    high = jax.lax.ppermute(lo_slab, axis_name,
                            [(i, (i - 1) % p) for i in range(p)])
    low = jax.lax.ppermute(hi_slab, axis_name,
                           [(i, (i + 1) % p) for i in range(p)])
    low = jnp.where(idx == 0, zero, low)
    high = jnp.where(idx == p - 1, zero, high)
    return low, high


def halo_exchange_grid(x, axis_z: str, axis_y: str):
    """Local block [lz, ly, nx] -> haloed [lz+2, ly+2, nx+2].

    z and y halos come from the device mesh rings; the x axis is unsharded
    and zero-padded (grid edge).
    """
    lo_z, hi_z = _axis_halo(x, axis_z, 0)
    xz = jnp.concatenate([lo_z, x, hi_z], axis=0)          # [lz+2, ly, nx]
    lo_y, hi_y = _axis_halo(xz, axis_y, 1)
    xzy = jnp.concatenate([lo_y, xz, hi_y], axis=1)        # [lz+2, ly+2, nx]
    return jnp.pad(xzy, ((0, 0), (0, 0), (1, 1)))


def grid_stencil_matvec_2d(data, x, offsets_grid, axis_z: str, axis_y: str):
    """Sharded y = A x on a ("z","y") device mesh.

    data [K, lz, ly, nx] local, x [lz, ly, nx] local; offsets_grid is a
    tuple of (dz, dy, dx) with |d| <= 1 (the structured P1 patterns).
    """
    xp = halo_exchange_grid(x, axis_z, axis_y)
    lz, ly, nx = x.shape
    y = None
    for k, (dz, dy, dx) in enumerate(offsets_grid):
        sl = xp[1 + dz:1 + dz + lz, 1 + dy:1 + dy + ly, 1 + dx:1 + dx + nx]
        y = data[k] * sl if y is None else y + data[k] * sl
    return y


def _pdot2(a, b, axes):
    return jax.lax.psum(jnp.vdot(a, b), axes)


def grid_cg_sharded_2d(data, offsets_grid, b, mesh: Mesh, *,
                       tol: float = 1e-8, maxiter: int = 500,
                       axis_z: str = "z", axis_y: str = "y") -> CGResult:
    """Jacobi-PCG with the whole Krylov loop inside one shard_map region.

    data [K, nz, ny, nx] (global), b [nz, ny, nx]; nz/ny must divide the
    mesh's ("z","y") extents.  Diagonal = offset (0,0,0).
    """
    diag_k = next(i for i, o in enumerate(offsets_grid)
                  if tuple(o) == (0, 0, 0))
    axes = (axis_z, axis_y)
    tol = float(tol)

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis_z, axis_y, None), P(axis_z, axis_y, None)),
        out_specs=(P(axis_z, axis_y, None), P(), P(), P(), P()))
    def run(data_l, b_l):
        def matvec(v):
            return grid_stencil_matvec_2d(data_l, v, offsets_grid,
                                          axis_z, axis_y)

        d = data_l[diag_k]
        inv_d = jnp.where(d != 0, 1.0 / d, 1.0)
        b_norm2 = _pdot2(b_l, b_l, axes)
        safe_b = jnp.where(b_norm2 > 0, jnp.sqrt(b_norm2), 1.0)
        atol = tol * safe_b

        r0 = b_l
        z0 = inv_d * r0
        rz0 = _pdot2(r0, z0, axes)
        x0 = jnp.zeros_like(b_l)

        def step(st):
            x, r, z, p, rz, k, bad = st
            Ap = matvec(p)
            pAp = _pdot2(p, Ap, axes)
            alpha = rz / pAp
            x = x + alpha * p
            r = r - alpha * Ap
            z = inv_d * r
            rz_new = _pdot2(r, z, axes)
            beta = rz_new / rz
            p = z + beta * p
            bad = ~jnp.isfinite(rz_new) | ~jnp.isfinite(pAp) | (pAp <= 0)
            return (x, r, z, p, rz_new, k + 1, bad)

        st = (x0, r0, z0, z0, rz0, jnp.int32(0), jnp.asarray(False))

        def not_done(st):
            x, r, z, p, rz, k, bad = st
            rn2 = _pdot2(r, r, axes)
            return (jnp.sqrt(rn2) > atol) & (k < maxiter) & (~bad)

        x, r, _, _, _, k, bad = jax.lax.while_loop(not_done, step, st)
        rnorm = jnp.sqrt(_pdot2(r, r, axes)) / safe_b
        conv = (rnorm <= tol) & (~bad)
        return x, k, rnorm, conv, bad

    x, k, rnorm, conv, bad = run(data, b)
    return CGResult(x=x, iterations=k, residual_norm=rnorm,
                    converged=conv, diverged=bad)


def solve_grid_cg_2d(data, offsets_grid, b, mesh: Mesh, **kw) -> CGResult:
    """Device-put the global system with ("z","y") shardings and solve."""
    data = jax.device_put(jnp.asarray(data),
                          NamedSharding(mesh, P(None, "z", "y", None)))
    b = jax.device_put(jnp.asarray(b),
                       NamedSharding(mesh, P("z", "y", None)))
    return grid_cg_sharded_2d(data, offsets_grid, b, mesh, **kw)
