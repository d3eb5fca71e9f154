"""Distributed conjugate gradients under shard_map.

The whole Krylov loop runs inside one ``shard_map`` region: the matvec does
ring halo exchanges (tpufem.dist.stencil), and every inner product is a local
dot + ``psum`` over the mesh axis — the XLA collectives ride ICI
(SURVEY.md §2.4 "Communication backend").  State (x, r, z, p) lives sharded
for the entire solve; nothing is ever gathered to one chip.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.dist.partition import pad_rows
from tpufem.dist.stencil import sharded_stencil_matvec
from tpufem.solve.cg import CGResult

__all__ = ["stencil_cg_sharded", "distributed_stencil_solve"]


def _pdot(a, b, axis_name):
    return jax.lax.psum(jnp.vdot(a, b), axis_name)


def stencil_cg_sharded(data, offsets, b, mesh: Mesh, *,
                       axis_name: str = "rows", tol: float = 1e-8,
                       maxiter: int = 1000, diag_precondition: bool = True,
                       diag_k: Optional[int] = None):
    """Solve A x = b with CG, A in stencil form, sharded over ``mesh``.

    data [K, NN], b [NN] with NN divisible by the mesh axis size (use
    tpufem.dist.partition.pad_rows first).  Returns a CGResult whose ``x`` is
    the global (sharded) solution array.
    """
    offsets = tuple(int(o) for o in offsets)
    num = mesh.shape[axis_name]
    n = b.shape[0]
    if n % num:
        raise ValueError(f"rows {n} not divisible by mesh axis {num}; "
                         "pad with tpufem.dist.partition.pad_rows")
    if diag_k is None:
        diag_k = offsets.index(0)
    halo = max(abs(o) for o in offsets)
    if n // num < halo:
        raise ValueError(
            f"local stripe ({n // num} rows) thinner than the stencil halo "
            f"({halo}): single-hop neighbor exchange cannot cover it — use "
            "fewer shards or a larger mesh")

    tol = float(tol)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis_name), P(axis_name)),
        out_specs=(P(axis_name), P(), P(), P(), P()))
    def run(data_l, b_l):
        def matvec(v):
            return sharded_stencil_matvec(data_l, v, offsets, axis_name)

        if diag_precondition:
            d = data_l[diag_k]
            inv_d = jnp.where(d != 0, 1.0 / d, 1.0)
            prec = lambda r: r * inv_d
        else:
            prec = lambda r: r

        b_norm2 = _pdot(b_l, b_l, axis_name)
        safe_b = jnp.where(b_norm2 > 0, b_norm2, 1.0)
        atol2 = (tol ** 2) * safe_b

        x0 = jnp.zeros_like(b_l)
        r0 = b_l
        z0 = prec(r0)
        rz0 = _pdot(r0, z0, axis_name)
        rr0 = b_norm2

        def not_done(state):
            _, _, _, _, rz, rr, k, bad = state
            return (rr > atol2) & (k < maxiter) & (~bad)

        def step(state):
            x, r, z, p, rz, rr, k, bad = state
            Ap = matvec(p)
            pAp = _pdot(p, Ap, axis_name)
            alpha = rz / pAp
            x = x + alpha * p
            r = r - alpha * Ap
            z = prec(r)
            rz_new = _pdot(r, z, axis_name)
            rr_new = _pdot(r, r, axis_name)
            beta = rz_new / rz
            p = z + beta * p
            bad = (~jnp.isfinite(rz_new)) | (~jnp.isfinite(pAp)) | (pAp <= 0)
            return (x, r, z, p, rz_new, rr_new, k + 1, bad)

        init = (x0, r0, z0, z0, rz0, rr0, jnp.int32(0), jnp.asarray(False))
        x, r, _, _, _, rr, k, bad = jax.lax.while_loop(not_done, step, init)
        relres = jnp.sqrt(rr / safe_b)
        converged = (rr <= atol2) & (~bad)
        return x, k, relres, converged, bad

    x, k, relres, converged, bad = run(data, b)
    return CGResult(x=x, iterations=k, residual_norm=relres,
                    converged=converged, diverged=bad)


def distributed_stencil_solve(A, b, mesh: Mesh, *, axis_name: str = "rows",
                              tol: float = 1e-8, maxiter: int = 1000,
                              diag_precondition: bool = True):
    """Convenience wrapper: pad a StencilMatrix system, shard it over the
    mesh, CG-solve, return (x [original rows], CGResult)."""
    num = mesh.shape[axis_name]
    diag_k = A.offsets.index(0)
    data_p, b_p, n = pad_rows(A.data, b, A.offsets, num, diag_k)
    sharding = NamedSharding(mesh, P(axis_name))
    data_p = jax.device_put(data_p, NamedSharding(mesh, P(None, axis_name)))
    b_p = jax.device_put(b_p, sharding)
    res = stencil_cg_sharded(data_p, A.offsets, b_p, mesh,
                             axis_name=axis_name, tol=tol, maxiter=maxiter,
                             diag_precondition=diag_precondition,
                             diag_k=diag_k)
    return res.x[:n], res
