"""Distributed geometric multigrid: z-plane-sharded V-cycle under shard_map.

Realizes SURVEY.md §2.4's halo-exchange design beyond the 1D stencil-stripe
CG of :mod:`tpufem.dist.cg`: the full MG-PCG solve — smoothing, residuals,
restriction, prolongation, and all CG reductions — runs inside ONE
``shard_map`` region over a device mesh, with

  * vectors and stencil data sharded by **z-plane stripes** of the 3D node
    grid (2D: y-row stripes) — the contiguous-leading-axis layout whose
    halos are single planes;
  * one ``ppermute`` plane exchange per stencil application (matvec, Jacobi
    smooth, residual, transfer stencil W) — ring traffic over ICI,
    volume = 2 plane slabs per shard boundary, independent of grid size;
  * grid transfers computed **in place, sharded**: even-plane z-sampling is
    local because every distributed level keeps an even number of local
    planes; y/x sampling/injection are the same 0/1 selection matmuls as
    the single-chip hierarchy (tpufem.solve.multigrid);
  * coarse levels below ``min_local_planes`` **gathered to replicated**
    (one ``all_gather`` of the already-restricted residual — 1/8^k of the
    fine grid) and solved with the same ops minus the exchanges, ending in
    the dense coarsest inverse;
  * CG dot products: local dot + ``psum``.

Levels use PLAIN node grids (z-padded to shards * local_planes); the
z-padding planes are treated exactly like Dirichlet rows (identity diagonal,
zero rhs) so they stay decoupled from the valid system.

Operators are assembled analytically per level (uniform boxes — see
tpufem.solve.multigrid._uniform_stencil_data), so building a sharded
hierarchy never materializes element arrays anywhere.

The reference has no distributed code at all (MPI is only a PBS launcher,
/root/reference/job.pbs:26).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.assemble.structured import structured_plan
from tpufem.solve.cg import CGResult
from tpufem.solve.multigrid import (_light_grid, _sample_matrix,
                                    _stencil_offsets,
                                    _uniform_cell_stiffness,
                                    _uniform_stencil_data)

__all__ = ["DistMGLevel", "build_dist_hierarchy", "mgpcg_dist",
           "solve_poisson_dist"]

_HI = jax.lax.Precision.HIGHEST


# -- sharded grid primitives -------------------------------------------------

def _z_halo(x, axis_name: Optional[str]):
    """(left, right) single-plane halos of a [Z, ...] local block.

    axis_name=None (replicated level): zeros — the grid is whole.
    Global-boundary shards also receive zeros (grid edge)."""
    zero = jnp.zeros_like(x[:1])
    if axis_name is None:
        return zero, zero
    idx = jax.lax.axis_index(axis_name)
    p = jax.lax.axis_size(axis_name)
    right = jax.lax.ppermute(x[:1], axis_name,
                             [(i, (i - 1) % p) for i in range(p)])
    left = jax.lax.ppermute(x[-1:], axis_name,
                            [(i, (i + 1) % p) for i in range(p)])
    left = jnp.where(idx == 0, zero, left)
    right = jnp.where(idx == p - 1, zero, right)
    return left, right


def _apply_grid_stencil(weights_of, x, offsets_grid, axis_name):
    """y = sum_k w_k * shift(x, offset_k) with plane halo exchange.

    weights_of(k) -> scalar or [Z, ...] array (None for skip); offsets are
    (dz, dy, dx) (3D) or (dy, dx) (2D) grid tuples with |d| <= 1."""
    dim = x.ndim
    left, right = _z_halo(x, axis_name)
    xp = jnp.concatenate([left, x, right], axis=0)
    xp = jnp.pad(xp, [(0, 0)] + [(1, 1)] * (dim - 1))
    y = None
    for k, off in enumerate(offsets_grid):
        w = weights_of(k)
        if w is None:
            continue
        sl = (slice(1 + off[0], 1 + off[0] + x.shape[0]),) + tuple(
            slice(1 + off[d], 1 + off[d] + x.shape[d])
            for d in range(1, dim))
        y = w * xp[sl] if y is None else y + w * xp[sl]
    return y


def grid_stencil_matvec(data, x, offsets_grid, axis_name):
    """Sharded y = A x. data [K, Z, ...] local, x [Z, ...] local."""
    return _apply_grid_stencil(lambda k: data[k], x, offsets_grid, axis_name)


def _transfer_w(x, axis_name):
    """W = I + 0.5 * adjacency stencil (P1 transfer weights), sharded."""
    dim = x.ndim
    offs = [(0,) * dim] + _stencil_offsets(dim)
    return _apply_grid_stencil(lambda k: 1.0 if k == 0 else 0.5,
                               x, offs, axis_name)


def _apply_axis_matmul(x, M, axis):
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.matmul(moved, M, precision=_HI)
    return jnp.moveaxis(out, -1, axis)


def _sample_minor(x):
    """Even-position sampling along every non-leading axis (y, x)."""
    for ax in range(1, x.ndim):
        S = _sample_matrix(x.shape[ax], x.dtype)
        x = _apply_axis_matmul(x, S, ax)
    return x


def _inject_minor(x, fine_sizes):
    """Zero-injection (adjoint of _sample_minor) along non-leading axes."""
    for ax in range(1, x.ndim):
        S = _sample_matrix(fine_sizes[ax - 1], x.dtype)
        x = _apply_axis_matmul(x, S.T, ax)
    return x


def _sample_z_local(x):
    """Even-plane decimation of the local z-block (local planes are even and
    shard offsets are even multiples, so global parity == local parity)."""
    return x[0::2]


def _inject_z_local(x, out_planes: int):
    """Zero-interleave along z: coarse local [mc, ...] -> fine [2*mc, ...]."""
    z = jnp.zeros_like(x)
    out = jnp.stack([x, z], axis=1).reshape((2 * x.shape[0],) + x.shape[1:])
    return out[:out_planes]


# -- hierarchy ---------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DistMGLevel:
    """One level; arrays are GLOBAL (shard with `shard_specs` / device_put).

    data [K, Zp, ...]: stencil values on the z-padded plain node grid,
    Dirichlet + z-pad rows eliminated to identity.
    """
    data: np.ndarray
    inv_diag: np.ndarray
    bc_mask: np.ndarray            # True on Dirichlet AND z-pad rows
    offsets_grid: tuple
    node_grid: tuple               # valid (nz, ny, nx)
    local_planes: int              # Zp // n_shards (distributed levels)
    distributed: bool
    coarse_inverse: Optional[np.ndarray] = None   # replicated coarsest


def _analytic_level(domain, s: int, dim: int, dtype):
    """(data [K, *ng], mask [*ng], offsets_grid) plain-grid, BC-eliminated."""
    info, _, bc_grid = _light_grid(domain, s, dim, with_coords=False)
    plan = structured_plan(info, embed=False)
    Ke = _uniform_cell_stiffness(domain, s, dim, np.float64)
    raw = _uniform_stencil_data(plan, Ke, dtype)       # [K, NN] flat
    ng = tuple(info.node_grid)
    data = raw.reshape((plan.width,) + ng)
    mask = bc_grid
    # grid-aware symmetric elimination: zero bc rows/cols, identity diag
    keep = ~mask
    mp = np.pad(mask, [(1, 1)] * dim)
    for k, off in enumerate(plan.offsets_grid):
        sl = tuple(slice(1 + off[d], 1 + off[d] + ng[d]) for d in range(dim))
        col_bc = mp[sl]
        data[k] = np.where(keep & ~col_bc, data[k], 0)
        if all(o == 0 for o in off):
            data[k] = np.where(mask, 1.0, data[k])
    return data, mask, plan.offsets_grid


def build_dist_hierarchy(domain, n_cells: int, dim: int, n_shards: int, *,
                         dtype=np.float32, coarse_max: int = 8,
                         min_local_planes: int = 4) -> List[DistMGLevel]:
    """Analytic z-sharded hierarchy on (domain)^dim with n_cells^dim cells.

    Distributed levels keep an EVEN number of local planes (>= 2) so that
    even-plane sampling stays local; once a level would drop below
    ``min_local_planes`` it becomes replicated (gathered V-cycle tail).
    """
    sizes = [n_cells]
    while sizes[-1] % 2 == 0 and sizes[-1] > coarse_max:
        sizes.append(sizes[-1] // 2)

    # Distributed levels 0..n_dist-1 get local_planes = m0 / 2^i; keeping
    # every distributed level's plane count even makes z-sampling local.
    # The last level is always replicated (it may carry the dense inverse).
    base = -(-(sizes[0] + 2) // n_shards)      # >= nz planes incl. boundary
    n_dist, m0 = 0, base
    for nd in range(1, len(sizes)):
        q = 1 << nd
        m = -(-base // q) * q                  # round up to multiple of 2^nd
        if m >> (nd - 1) >= max(2, min_local_planes):
            n_dist, m0 = nd, m
        else:
            break

    out: List[DistMGLevel] = []
    for li, s in enumerate(sizes):
        data, mask, offsets_grid = _analytic_level(domain, s, dim, dtype)
        ng = data.shape[1:]
        distributed = li < n_dist
        if distributed:
            m = m0 >> li
            zp = n_shards * m
        else:
            m = 0
            zp = ng[0]
        if zp < ng[0]:
            raise ValueError(
                f"level {li}: padded z {zp} < grid z {ng[0]}; "
                "increase min_local_planes or reduce shards")
        pad = zp - ng[0]
        if pad:
            data = np.pad(data, [(0, 0), (0, pad)] + [(0, 0)] * (dim - 1))
            mask = np.pad(mask, [(0, pad)] + [(0, 0)] * (dim - 1),
                          constant_values=True)
            diag_k = next(i for i, o in enumerate(offsets_grid)
                          if all(v == 0 for v in o))
            data[diag_k, ng[0]:] = 1.0     # z-pad rows: identity, like bc
        d = data[next(i for i, o in enumerate(offsets_grid)
                      if all(v == 0 for v in o))]
        with np.errstate(divide="ignore"):
            inv_d = np.where(d != 0, 1.0 / d, 1.0).astype(data.dtype)
        out.append(DistMGLevel(data=data, inv_diag=inv_d, bc_mask=mask,
                               offsets_grid=tuple(offsets_grid),
                               node_grid=tuple(ng), local_planes=m,
                               distributed=distributed))

    # dense inverse on the (replicated) coarsest level
    last = out[-1]
    nnp = int(np.prod(last.data.shape[1:]))
    if nnp <= 20_000:
        dense = np.zeros((nnp, nnp), np.float64)
        ngp = last.data.shape[1:]
        strides = np.array([int(np.prod(ngp[d + 1:])) for d in range(dim)])
        idx = np.arange(nnp)
        pos = np.stack([(idx // strides[d]) % ngp[d] for d in range(dim)])
        for k, off in enumerate(last.offsets_grid):
            cpos = pos + np.asarray(off)[:, None]
            valid = np.all((cpos >= 0) & (cpos < np.asarray(ngp)[:, None]),
                           axis=0)
            ci = (cpos * strides[:, None]).sum(0)
            vals = last.data[k].reshape(-1)
            mrow = valid & (vals != 0)
            np.add.at(dense, (idx[mrow], np.clip(ci, 0, nnp - 1)[mrow]),
                      vals[mrow].astype(np.float64))
        inv = np.linalg.inv(dense).astype(last.data.dtype)
        out[-1] = dataclasses.replace(last, coarse_inverse=inv)
    return out


def shard_specs(levels: List[DistMGLevel], axis_name: str = "z"):
    """PartitionSpecs matching ``_level_arrays(levels)`` for device_put."""
    specs = []
    for lv in levels:
        if lv.distributed:
            sd = P(None, axis_name)
            sv = P(axis_name)
        else:
            sd = P()
            sv = P()
        ci = P() if lv.coarse_inverse is not None else None
        specs.append((sd, sv, sv, ci))
    return specs


def _level_arrays(levels: List[DistMGLevel]):
    return [(lv.data, lv.inv_diag, lv.bc_mask, lv.coarse_inverse)
            for lv in levels]


def put_hierarchy(levels: List[DistMGLevel], mesh: Mesh,
                  axis_name: str = "z"):
    """device_put all level arrays with their sharding specs; returns the
    pytree to pass to :func:`mgpcg_dist`."""
    arrays = _level_arrays(levels)
    specs = shard_specs(levels, axis_name)
    out = []
    for (d, iv, m, ci), (sd, sv, sm, sc) in zip(arrays, specs):
        out.append((
            jax.device_put(jnp.asarray(d), NamedSharding(mesh, sd)),
            jax.device_put(jnp.asarray(iv), NamedSharding(mesh, sv)),
            jax.device_put(jnp.asarray(m), NamedSharding(mesh, sm)),
            None if ci is None else jax.device_put(
                jnp.asarray(ci), NamedSharding(mesh, sc)),
        ))
    return out


# -- sharded V-cycle ----------------------------------------------------------

def _v_cycle_local(levels: List[DistMGLevel], arrs, r, li: int,
                   axis_name: str, nu1: int, nu2: int, omega: float):
    """V-cycle on local blocks. r: [m, ny, nx] (distributed) or full grid
    (replicated). Returns e with the same layout."""
    lv = levels[li]
    data, inv_d, mask, cinv = arrs[li]
    ax = axis_name if lv.distributed else None
    dim = r.ndim

    if lv.distributed:
        idx = jax.lax.axis_index(axis_name)

    def matvec(v):
        return grid_stencil_matvec(data, v, lv.offsets_grid, ax)

    def smooth(rr, e):
        return e + omega * inv_d * (rr - matvec(e))

    if li == len(levels) - 1:
        if cinv is not None:
            rf = r.reshape(-1)
            e = jnp.dot(cinv, rf, preferred_element_type=rf.dtype)
            return e.reshape(r.shape)
        e = omega * inv_d * r
        for _ in range(20):
            e = smooth(r, e)
        return e

    e = omega * inv_d * r
    for _ in range(nu1 - 1):
        e = smooth(r, e)

    resid = r - matvec(e)
    # restrict: W (halo'd stencil), then sample even z / even y,x
    wr = _transfer_w(resid, ax)
    if lv.distributed:
        rc = _sample_minor(_sample_z_local(wr))
    else:
        rc = _sample_minor(wr[0::2])

    nxt = levels[li + 1]
    if lv.distributed and not nxt.distributed:
        # transition: gather the restricted residual to replicated
        rc = jax.lax.all_gather(rc, axis_name, axis=0, tiled=True)
    # reconcile z extent with the next level's padded z size
    zc_target = (nxt.local_planes if nxt.distributed
                 else nxt.data.shape[1])
    if rc.shape[0] > zc_target:
        rc = rc[:zc_target]
    elif rc.shape[0] < zc_target:
        rc = jnp.pad(rc, [(0, zc_target - rc.shape[0])]
                     + [(0, 0)] * (dim - 1))
    # y/x: even-sampling of size s gives ceil(s/2), vs next grid's ny/nx
    tgt = nxt.data.shape[2:]
    if any(rc.shape[1 + d] != tgt[d] for d in range(dim - 1)):
        pads = [(0, 0)] + [(0, max(0, tgt[d] - rc.shape[1 + d]))
                           for d in range(dim - 1)]
        rc = jnp.pad(rc, pads)[
            tuple([slice(None)] + [slice(0, tgt[d])
                                   for d in range(dim - 1)])]
    _, _, mask_c, _ = arrs[li + 1]
    rc = jnp.where(mask_c, 0, rc)

    ec = _v_cycle_local(levels, arrs, rc, li + 1, axis_name, nu1, nu2, omega)

    # prolong: inject z / y,x then W on THIS level
    if lv.distributed and not nxt.distributed:
        # take my stripe of the replicated coarse correction (pad first so
        # the last shards' dynamic_slice windows stay in bounds; correction
        # is zero beyond the valid grid)
        mc = lv.local_planes // 2
        p = jax.lax.axis_size(axis_name)
        zfull = p * mc
        if ec.shape[0] < zfull:
            ec = jnp.pad(ec, [(0, zfull - ec.shape[0])]
                         + [(0, 0)] * (dim - 1))
        ec = jax.lax.dynamic_slice_in_dim(ec, idx * mc, mc, 0)
    fine_minor = r.shape[1:]
    ef = _inject_minor(ec, fine_minor)
    ef = _inject_z_local(ef, r.shape[0])
    ef = _transfer_w(ef, ax)
    e = e + ef

    for _ in range(nu2):
        e = smooth(r, e)
    return e


def mgpcg_dist(levels: List[DistMGLevel], arrs, b, mesh: Mesh, *,
               axis_name: str = "z", tol: float = 1e-8, maxiter: int = 200,
               nu1: int = 1, nu2: int = 1, omega: float = 0.8) -> CGResult:
    """MG-preconditioned CG, entirely inside one shard_map region.

    b: GLOBAL [Zp, ny, nx] grid array (z-padded; pad planes zero), sharded
    or shardable over ``mesh``.  arrs: from :func:`put_hierarchy`.
    Returns CGResult with x as the global sharded grid array.
    """
    fine = levels[0]
    tol = float(tol)
    if not fine.distributed:
        # degenerate hierarchy (odd n_cells or too few planes per shard):
        # every level is replicated — solve without shard_map, same math
        from tpufem.solve.cg import cg as _plain_cg

        arrs_t = tuple(arrs)

        @jax.jit
        def run_rep(arrs_t, b):
            data0 = arrs_t[0][0]

            def mv(v):
                return grid_stencil_matvec(data0, v, fine.offsets_grid,
                                           None)

            def M(r):
                return _v_cycle_local(levels, arrs_t, r, 0, None, nu1,
                                      nu2, omega)

            return _plain_cg(mv, b, tol=tol, maxiter=maxiter, M=M)

        return run_rep(arrs_t, jnp.asarray(b))

    specs = shard_specs(levels, axis_name)
    in_specs = (tuple(specs), P(axis_name))

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(axis_name), P(), P(), P(), P()))
    def run(arrs_l, b_l):
        data0, inv0, mask0, _ = arrs_l[0]

        def matvec(v):
            return grid_stencil_matvec(data0, v, fine.offsets_grid,
                                       axis_name)

        def precond(r):
            return _v_cycle_local(levels, arrs_l, r, 0, axis_name, nu1,
                                  nu2, omega)

        def pdot(a_, b_):
            return jax.lax.psum(jnp.vdot(a_, b_), axis_name)

        bb = pdot(b_l, b_l)
        safe_b = jnp.where(bb > 0, bb, 1.0)
        atol2 = (tol ** 2) * safe_b

        x0 = jnp.zeros_like(b_l)
        r0 = b_l
        z0 = precond(r0)
        rz0 = pdot(r0, z0)

        def not_done(st):
            _, _, _, _, rz, rr, k, bad = st
            return (rr > atol2) & (k < maxiter) & (~bad)

        def step(st):
            x, r, z, p, rz, rr, k, bad = st
            Ap = matvec(p)
            pAp = pdot(p, Ap)
            alpha = rz / pAp
            x = x + alpha * p
            r = r - alpha * Ap
            z = precond(r)
            rz_n = pdot(r, z)
            rr_n = pdot(r, r)
            p = z + (rz_n / rz) * p
            bad = (~jnp.isfinite(rz_n)) | (~jnp.isfinite(pAp)) | (pAp <= 0)
            return (x, r, z, p, rz_n, rr_n, k + 1, bad)

        init = (x0, r0, z0, z0, rz0, bb, jnp.int32(0), jnp.asarray(False))
        x, r, _, _, _, rr, k, bad = jax.lax.while_loop(not_done, step, init)
        relres = jnp.sqrt(rr / safe_b)
        return x, k, relres, (rr <= atol2) & (~bad), bad

    x, k, relres, conv, bad = run(tuple(arrs), b)
    return CGResult(x=x, iterations=k, residual_norm=relres, converged=conv,
                    diverged=bad)


def solve_poisson_dist(domain, n_cells: int, dim: int, mesh: Mesh,
                       b_nodes, *, axis_name: str = "z", dtype=np.float32,
                       tol: float = 1e-8, maxiter: int = 200,
                       coarse_max: int = 8, min_local_planes: int = 4
                       ) -> Tuple[jax.Array, CGResult]:
    """End-to-end distributed MG-PCG Poisson solve on (domain)^dim.

    b_nodes: RHS on the valid node grid (flat [NN] or [*node_grid]); BC rows
    must already carry their (zero-Dirichlet) values.  Returns (u [NN],
    CGResult); u is the node-ordered solution on the host.
    """
    n_shards = mesh.shape[axis_name]
    levels = build_dist_hierarchy(domain, n_cells, dim, n_shards,
                                  dtype=dtype, coarse_max=coarse_max,
                                  min_local_planes=min_local_planes)
    fine = levels[0]
    ng = fine.node_grid
    zp = fine.data.shape[1]
    b = np.asarray(b_nodes, dtype).reshape(ng)
    b = np.where(fine.bc_mask[:ng[0]], 0, b)
    if zp > ng[0]:
        b = np.pad(b, [(0, zp - ng[0])] + [(0, 0)] * (len(ng) - 1))
    arrs = put_hierarchy(levels, mesh, axis_name)
    b_dev = jax.device_put(jnp.asarray(b),
                           NamedSharding(mesh, P(axis_name)))
    res = mgpcg_dist(levels, arrs, b_dev, mesh, axis_name=axis_name,
                     tol=tol, maxiter=maxiter)
    u = np.asarray(res.x)[:ng[0]].reshape(-1)
    return u, res
