"""Distributed smoothed-aggregation AMG for unstructured ELL systems.

Completes the distributed-solver matrix: structured grids have a z-sharded
geometric MG V-cycle (tpufem.dist.multigrid); this gives *unstructured*
RCM-ordered systems — the storage the reference's most complete variant
assembles (/root/reference/fea_test_sm_sym_sparse2.cu:273-282, which has no
solver at all, let alone a multi-device one) — a mesh-robust preconditioner
across the device mesh.

TPU-first design: the interval aggregation of tpufem.solve.amg is what
makes this distribution *trivially local*.  Aggregates are fixed stride-s
windows along the RCM line; rows are partitioned into contiguous stripes
whose height is a multiple of s**num_levels, so

  * an aggregate NEVER straddles a shard boundary — restriction's window
    sum (pad/reshape/sum) and prolongation's upsample (repeat) are exactly
    shard-local, with zero communication;
  * the only communication in the whole cycle is the halo exchange of the
    banded SpMV inside P = (I - omega D^-1 A) T and the smoothers — one
    ``ppermute`` per direction per matvec (tpufem.dist.stencil), riding
    the ICI ring exactly like the stencil/ELL CG paths;
  * the coarsest solve is a replicated dense inverse applied to an
    ``all_gather`` of the (tiny) coarse residual — one MXU matmul.

Setup runs once on the host (the same float64 Galerkin products as
solve.amg — the system is pre-padded with identity rows so every level's
row count divides num_shards * s**remaining_levels); per-level operators
are then partitioned with tpufem.dist.ell.ell_partition and shipped
sharded.  The W-cycle option (gamma=2) carries over unchanged: the extra
coarse visits are where the mesh is cheapest.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.dist.ell import (ell_partition, pad_identity_rows,
                             sharded_ell_matvec, sharded_pcg_loop)
from tpufem.solve.amg import _cheb_smooth, build_amg
from tpufem.solve.cg import CGResult
from tpufem.sparse.ell import ELLMatrix

__all__ = ["DistAMGHierarchy", "build_dist_amg", "dist_amg_apply",
           "dist_amg_pcg"]


class _LevelStatic(NamedTuple):
    halo: int               # matvec halo rows per side at this level
    s: int                  # aggregate stride
    lmax: float             # Gershgorin bound on spec(D^-1 A)
    omega: float            # prolongator smoothing weight
    local_rows: int         # stripe height at this level


class DistAMGHierarchy(NamedTuple):
    # per-level HOST arrays: (data [NP,K], rel [NP,K], inv_diag [NP],
    # tv [NP]) — kept as numpy so no full copy ever lands on one device;
    # dist_amg_apply/dist_amg_pcg device_put them with the row-stripe
    # sharding, so each device only ever holds its own stripe
    level_arrays: tuple
    static: tuple           # tuple[_LevelStatic], parallel to level_arrays
    # the fine operator's partition for the outer CG matvec — aliases
    # level_arrays[0] when levels exist; the only partition otherwise
    # (a system already at/below coarse_n builds ZERO levels and the
    # cycle is just the replicated dense solve)
    fine_arrays: tuple      # (data [NP,K], rel [NP,K], inv_diag [NP]) host
    fine_halo: int
    coarse_inv: np.ndarray  # [NC, NC] dense inverse (host; replicated at
                            # solve time)
    smoother_degree: int
    smoother_ratio: float
    gamma: int              # 1 = V-cycle, 2 = W-cycle
    n: int                  # original (unpadded) fine rows
    np_rows: int            # padded fine rows (= num_shards * stripe)
    num_shards: int
    base: object = None     # single-device AMGHierarchy on the padded
                            # system; kept only with keep_base=True
                            # (doubles device memory — parity tests only)


def build_dist_amg(data, cols, num_shards: int, *, coarse_n: int = 1200,
                   max_levels: int = 12, interval_size: int = 6,
                   cycle: str = "W", omega_scale: float = 4.0 / 3.0,
                   smoother_degree: int = 2, smoother_ratio: float = 8.0,
                   keep_base: bool = False,
                   chunk: int = 1 << 21) -> DistAMGHierarchy:
    """Build a sharded interval-aggregation hierarchy from host ELL arrays.

    ``data``/``cols``: the assembled, BC-applied, RCM-ordered system
    (numpy [N, K]).  The system is padded so that every level's rows
    divide ``num_shards`` with stripe heights that are multiples of the
    aggregate stride — the invariant that keeps all transfers shard-local.

    ``keep_base``: retain the single-device hierarchy (device-resident
    operator per level) on the result for parity testing; off by default
    so no full-size device copy outlives the build.  (The build itself
    still materializes the hierarchy on the default device transiently —
    build_amg's level operators; freed on return unless keep_base.)
    """
    data = np.asarray(data)
    cols = np.asarray(cols)
    n = data.shape[0]
    s = int(interval_size)

    # number of coarsening steps the hierarchy will take — a fixed point
    # on the PADDED size (padding can push a level count past the
    # unpadded estimate; the loop is monotone and bounded by max_levels)
    nlev = 0
    while True:
        unit = num_shards * s ** nlev
        np_rows = -(-n // unit) * unit
        m, steps = np_rows, 0
        while m > coarse_n and steps < max_levels:
            m = -(-m // s)
            steps += 1
        if steps == nlev:
            break
        nlev = steps
    data_p, cols_p = pad_identity_rows(data, cols, np_rows)

    A = ELLMatrix(jnp.asarray(data_p), jnp.asarray(cols_p))
    base = build_amg(A, coarse_n=coarse_n, max_levels=max_levels,
                     omega_scale=omega_scale,
                     smoother_degree=smoother_degree,
                     smoother_ratio=smoother_ratio,
                     aggregation="interval", interval_size=s, cycle=cycle,
                     chunk=chunk)
    assert len(base.levels) == nlev, (len(base.levels), nlev)

    level_arrays = []
    static = []
    for lv in base.levels:
        d = np.asarray(lv.A.data)
        c = np.asarray(lv.A.cols)
        part = ell_partition(d, c, num_shards)
        assert part.data.shape[0] == d.shape[0], \
            "level rows must already divide num_shards (padding invariant)"
        level_arrays.append((part.data, part.rel, part.inv_diag,
                             np.asarray(lv.tv)))
        static.append(_LevelStatic(halo=part.halo, s=lv.s, lmax=lv.lmax,
                                   omega=lv.omega,
                                   local_rows=part.local_rows))

    if level_arrays:
        # the outer CG's matvec aliases level 0's arrays — no extra memory
        fine_arrays = level_arrays[0][:3]
        fine_halo = static[0].halo
    else:
        # whole system at/below coarse_n: the "cycle" is the dense solve,
        # but the CG still needs the fine operator's partition
        part = ell_partition(data_p, cols_p, num_shards)
        fine_arrays = (part.data, part.rel, part.inv_diag)
        fine_halo = part.halo

    return DistAMGHierarchy(level_arrays=tuple(level_arrays),
                            static=tuple(static),
                            fine_arrays=fine_arrays, fine_halo=fine_halo,
                            coarse_inv=np.asarray(base.coarse_inv),
                            smoother_degree=int(smoother_degree),
                            smoother_ratio=float(smoother_ratio),
                            gamma=base.gamma, n=n, np_rows=np_rows,
                            num_shards=num_shards,
                            base=base if keep_base else None)


def _level_specs(h: DistAMGHierarchy, axis_name: str):
    return tuple((P(axis_name, None), P(axis_name, None), P(axis_name),
                  P(axis_name)) for _ in h.level_arrays)


def _device_arrays(h: DistAMGHierarchy, mesh: Mesh, axis_name: str):
    """Ship the host hierarchy to the mesh with its target shardings —
    each device materializes only its own row stripe (plus the small
    replicated coarse inverse); no full copy lands on any single chip."""
    row = NamedSharding(mesh, P(axis_name))
    row2 = NamedSharding(mesh, P(axis_name, None))
    rep = NamedSharding(mesh, P(None, None))
    levels = tuple((jax.device_put(d, row2), jax.device_put(r, row2),
                    jax.device_put(i, row), jax.device_put(t, row))
                   for (d, r, i, t) in h.level_arrays)
    if levels:
        fine = levels[0][:3]
    else:
        fd, fr, fi = h.fine_arrays
        fine = (jax.device_put(fd, row2), jax.device_put(fr, row2),
                jax.device_put(fi, row))
    cinv = jax.device_put(h.coarse_inv, rep)
    return levels, fine, cinv


def _mk_cycle(h: DistAMGHierarchy, axis_name: str):
    """Return cycle(levels_l, r_l) operating on shard-local arrays.

    ``levels_l``: the shard-local slices of h.level_arrays (as delivered
    inside shard_map).  Mirrors solve.amg._vcycle level by level; the
    transfers are shard-local by the stripe-height invariant.
    """
    nlev = len(h.static)
    deg, ratio = h.smoother_degree, h.smoother_ratio
    coarse_rows = h.coarse_inv.shape[0] // h.num_shards

    def smooth(l, levels_l, r0):
        data_l, rel_l, invd_l, _ = levels_l[l]
        st = h.static[l]

        def mv(v):
            return sharded_ell_matvec(data_l, rel_l, v, st.halo, axis_name)

        return _cheb_smooth(mv, invd_l, st.lmax, deg, ratio, r0)

    def cycle(l, levels_l, coarse_inv, r):
        if l == nlev:
            rg = jax.lax.all_gather(r, axis_name, tiled=True)
            zg = coarse_inv @ rg
            i = jax.lax.axis_index(axis_name)
            return jax.lax.dynamic_slice(zg, (i * coarse_rows,),
                                         (coarse_rows,))
        data_l, rel_l, invd_l, tv_l = levels_l[l]
        st = h.static[l]

        def mv(v):
            return sharded_ell_matvec(data_l, rel_l, v, st.halo, axis_name)

        def restrict(res):
            # rc = T^T (I - omega A D^-1) res: shard-local window sum
            w = tv_l * (res - st.omega * mv(invd_l * res))
            return w.reshape(st.local_rows // st.s, st.s).sum(axis=1)

        def prolong(xc):
            # x = (I - omega D^-1 A) T xc: shard-local upsample
            t = tv_l * jnp.repeat(xc, st.s,
                                  total_repeat_length=st.local_rows)
            return t - st.omega * (invd_l * mv(t))

        x = smooth(l, levels_l, r)
        res = r - mv(x)
        rc = restrict(res)
        xc = cycle(l + 1, levels_l, coarse_inv, rc)
        if h.gamma >= 2 and l + 1 < nlev:
            d1, r1, _, _ = levels_l[l + 1]
            st1 = h.static[l + 1]
            rc2 = rc - sharded_ell_matvec(d1, r1, xc, st1.halo, axis_name)
            xc = xc + cycle(l + 1, levels_l, coarse_inv, rc2)
        x = x + prolong(xc)
        x = x + smooth(l, levels_l, r - mv(x))
        return x

    return cycle


def dist_amg_apply(h: DistAMGHierarchy, r, mesh: Mesh, *,
                   axis_name: str = "rows"):
    """z = cycle(r) as a standalone sharded preconditioner application.

    ``r`` [np_rows] (padded).  Mainly for verification — the solver below
    inlines the cycle inside its sharded while_loop instead.
    """
    cycle = _mk_cycle(h, axis_name)
    levels_dev, _, cinv_dev = _device_arrays(h, mesh, axis_name)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_level_specs(h, axis_name), P(None, None), P(axis_name)),
        out_specs=P(axis_name))
    def run(levels_l, coarse_inv, r_l):
        return cycle(0, levels_l, coarse_inv, r_l)

    return run(levels_dev, cinv_dev, r)


def dist_amg_pcg(h: DistAMGHierarchy, b, mesh: Mesh, *,
                 axis_name: str = "rows", tol: float = 1e-8,
                 maxiter: int = 500):
    """AMG-preconditioned CG on the sharded system, fully inside shard_map.

    ``b``: host array [n] (original rows) or device [np_rows]; padded +
    sharded here.  Returns (x [n], CGResult) — same contract as
    tpufem.dist.ell.distributed_ell_solve.
    """
    tol = float(tol)
    cycle = _mk_cycle(h, axis_name)
    fine_halo = h.fine_halo
    levels_dev, fine_dev, cinv_dev = _device_arrays(h, mesh, axis_name)

    b = np.asarray(b)
    if b.shape[0] == h.n and h.np_rows != h.n:
        b = np.pad(b, (0, h.np_rows - h.n))
    b_dev = jax.device_put(jnp.asarray(b),
                           NamedSharding(mesh, P(axis_name)))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(_level_specs(h, axis_name),
                  (P(axis_name, None), P(axis_name, None), P(axis_name)),
                  P(None, None), P(axis_name)),
        out_specs=(P(axis_name), P(), P(), P(), P()))
    def run(levels_l, fine_l, coarse_inv, b_l):
        data_l, rel_l, _ = fine_l

        def matvec(v):
            return sharded_ell_matvec(data_l, rel_l, v, fine_halo,
                                      axis_name)

        def prec(r):
            return cycle(0, levels_l, coarse_inv, r)

        return sharded_pcg_loop(matvec, prec, b_l, axis_name, tol, maxiter)

    x, k, relres, converged, bad = run(levels_dev, fine_dev,
                                       cinv_dev, b_dev)
    res = CGResult(x=x, iterations=k, residual_norm=relres,
                   converged=converged, diverged=bad)
    return x[:h.n], res
