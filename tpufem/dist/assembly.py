"""Distributed fused assembly: each shard builds its z-stripe of the system.

Completes the general-geometry multi-chip pipeline: sharded node
coordinates in -> sharded fused Pallas system build -> sharded halo-CG
solve (tpufem.dist.cg), with nothing ever gathered to one chip.  The
analytic paths (dist.multigrid) cover uniform boxes; this path covers
arbitrary per-node geometry (perturbed/curvilinear structured grids).

Mechanics (inside one shard_map region):
  * the embedded store grid is split into z-plane stripes, one per shard
    (local leading size must be a multiple of the kernel z-block);
  * each shard ppermute-exchanges one z-BLOCK of node coordinates with its
    ring neighbors and runs the fused kernel over an extended local array —
    the kernel's overlapping BlockSpecs then see exactly the same halo
    coordinates they would on a single chip;
  * the kernel's boundary/validity masks come from global node indices:
    the shard's global z offset enters as an SMEM scalar (a traced value —
    it cannot be baked into the grid like the single-chip program id).

The per-shard outputs ARE the row stripes that tpufem.dist.cg's
stencil_cg_sharded consumes, so assembly output feeds the distributed
solver with zero relayout.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.assemble.structured import StructuredPlan
from tpufem.ops.fused_system_pallas import _kernel, _pick_blocks
from tpufem.utils.pallas_ctx import trace_ctx as _trace_ctx

__all__ = ["build_poisson_system_sharded", "solve_poisson_dist_general"]


def build_poisson_system_sharded(plan: StructuredPlan, C_emb, mesh: Mesh,
                                 f_planes, rule, *, axis_name: str = "z",
                                 rhs_mode: str = "quadrature",
                                 interpret: bool = False):
    """(data [K, NS], rhs [NS]) sharded by row stripes over ``mesh``.

    C_emb: [3, E0, E1, E2] embedded node coordinates (global array or
    already sharded by the leading axis).  E0 must be divisible by
    n_shards and the local stripe by the kernel z-block.
    """
    if not plan.embedded:
        raise ValueError("plan must be built with structured_plan(embed=True)")
    info = plan.info
    if len(info.node_grid) != 3:
        raise NotImplementedError("sharded fused build is 3D")
    sg = plan.store_grid
    K = plan.width
    n_shards = mesh.shape[axis_name]
    if sg[0] % n_shards:
        raise ValueError(f"store z {sg[0]} not divisible by {n_shards}")
    local_e0 = sg[0] // n_shards
    auto_bz, By = _pick_blocks((local_e0,) + sg[1:], K)
    Bz = auto_bz
    if local_e0 % Bz:
        raise ValueError(f"local stripe {local_e0} not divisible by "
                         f"z-block {Bz}")
    nzb, nyb = local_e0 // Bz, sg[1] // By

    from tpufem.fem.elements import P1Tetrahedron

    el = P1Tetrahedron()
    phi = [[float(v) for v in row] for row in el.shape_values(rule.points)]
    wq = [float(w) for w in rule.weights]
    T = info.num_types
    npe = 4
    plan_tables = []
    for t in range(T):
        entry_k = [[int(plan.entry_k[t, a, b]) for b in range(npe)]
                   for a in range(npe)]
        node_off = [tuple(int(v) for v in info.type_node_offsets[t, a])
                    for a in range(npe)]
        plan_tables.append((entry_k, node_off))
    node_max = (info.node_grid[0] - 1, info.node_grid[1] - 1,
                info.node_grid[2] - 1)

    body = functools.partial(
        _kernel, plan_tables=plan_tables,
        offsets_grid=tuple(tuple(int(v) for v in o)
                           for o in plan.offsets_grid),
        Bz=Bz, By=By, node_max=node_max, phi=phi, wq=wq,
        f_planes=f_planes, dim=3, npe=npe, num_types=T, apply_bc=True,
        rhs_mode=rhs_mode)

    def kern(zb_ref, *refs):
        body(*refs, zbase_ref=zb_ref)

    cblock = (3, Bz, By, sg[2])
    # the coordinate array is EXTENDED by one z-block of halo on each side,
    # so block zi's (prev, cur, next) live at extended indices zi, zi+1,
    # zi+2 — no clipping: the ends hold real neighbor data (interior
    # shards) or zeros (global ends, where cells are masked invalid anyway)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
        pl.BlockSpec(cblock,
                     (lambda di, dj: lambda zi, yj: (
                         0, zi + di + 1, jnp.clip(yj + dj, 0, nyb - 1), 0)
                      )(di, dj),
                     memory_space=pltpu.VMEM)
        for di in (-1, 0, 1) for dj in (-1, 0, 1)]

    # check_vma=False: pallas_call outputs can't declare their mesh-axis
    # variance yet (jax would otherwise require vma on every out_shape)
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis_name, None, None),),
        out_specs=(P(None, axis_name), P(axis_name)),
        check_vma=False)
    def run(C_l):
        idx = jax.lax.axis_index(axis_name)
        p = jax.lax.axis_size(axis_name)
        zero = jnp.zeros_like(C_l[:, :Bz])
        right = jax.lax.ppermute(C_l[:, :Bz], axis_name,
                                 [(i, (i - 1) % p) for i in range(p)])
        left = jax.lax.ppermute(C_l[:, -Bz:], axis_name,
                                [(i, (i + 1) % p) for i in range(p)])
        left = jnp.where(idx == 0, zero, left)
        right = jnp.where(idx == p - 1, zero, right)
        C_ext = jnp.concatenate([left, C_l, right], axis=1)
        zbase = (idx * local_e0).astype(jnp.int32)[None]

        with _trace_ctx(C_l.dtype):
            data, rhs = pl.pallas_call(
                kern,
                grid=(nzb, nyb),
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((K, Bz, By, sg[2]),
                                 lambda zi, yj: (0, zi, yj, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((Bz, By, sg[2]),
                                 lambda zi, yj: (zi, yj, 0),
                                 memory_space=pltpu.VMEM),
                ),
                out_shape=(
                    jax.ShapeDtypeStruct((K, local_e0) + tuple(sg[1:]),
                                         C_l.dtype),
                    jax.ShapeDtypeStruct((local_e0,) + tuple(sg[1:]),
                                         C_l.dtype),
                ),
                interpret=interpret,
            )(zbase, *([C_ext] * 9))
        nloc = local_e0 * sg[1] * sg[2]
        return data.reshape(K, nloc), rhs.reshape(nloc)

    C_dev = jax.device_put(
        jnp.asarray(C_emb),
        NamedSharding(mesh, P(None, axis_name, None, None)))
    return run(C_dev)


def solve_poisson_dist_general(plan: StructuredPlan, C_emb, mesh: Mesh,
                               f_planes, rule, *, axis_name: str = "z",
                               tol: float = 1e-6, maxiter: int = 2000,
                               interpret: bool = False):
    """General-geometry distributed pipeline: sharded fused assembly ->
    sharded Jacobi-preconditioned halo CG.  Returns (u [NN] host, CGResult).
    """
    from tpufem.dist.cg import stencil_cg_sharded

    data, b = build_poisson_system_sharded(
        plan, C_emb, mesh, f_planes, rule, axis_name=axis_name,
        interpret=interpret)
    res = stencil_cg_sharded(data, plan.offsets, b, mesh,
                             axis_name=axis_name, tol=tol, maxiter=maxiter)
    x = jnp.asarray(res.x)
    u = np.asarray(plan.extract_field(x))
    return u, res
