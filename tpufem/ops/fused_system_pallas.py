"""Pallas TPU kernel: single-pass Poisson system build (structured 2D/3D).

Reads *node coordinates only* — 3 planes instead of the 72 element-coord
planes (element corners are recovered by in-VMEM shifts, since on a
structured mesh every element's vertices are fixed grid offsets of its base
node) — and emits the complete solver-ready system in one pass:

    stiffness (embedded stencil data)  +  RHS load vector
    +  zero-Dirichlet boundary elimination on the box boundary

HBM traffic: ~9x the 3 node-coordinate planes (overlapping z/y neighbor
blocks) + K stencil planes + 1 RHS plane out — ~200 MB at 1M DOFs versus
~1.5 GB for the unfused XLA pipeline.  Geometry, the 96 local-matrix entries
per cell, quadrature, masking and BC all happen in VMEM.

Blocking: 2D grid over (leading z-blocks, sublane y-blocks).  Halos come
from overlapping prev/cur/next BlockSpecs on both axes (3 x 3 coordinate
blocks); x (lane) shifts are rolls whose wraparound lands only on zero
-coefficient border columns; z/y contribution placement is pure slicing.
Boundary masks are derived from global iota indices — no mask inputs.

Contracts:
  * ``node_coords_embedded`` layout: [dim, E0, E1, E2] with node (z, y, x)
    at (z+1, y+1, x+1); out-of-range positions carry synthetic index-valued
    coordinates (finite geometry), masked out by cell validity.
  * zero Dirichlet data on the full box boundary (the reference's model
    problem); other BCs go through the XLA path (tpufem.solve.bc).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufem.assemble.structured import StructuredPlan
from tpufem.fem.quadrature import QuadratureRule
from tpufem.mesh.core import Mesh
from tpufem.sparse.stencil import StencilMatrix

__all__ = ["node_coords_embedded", "node_coords_embedded_from_grid",
           "build_poisson_system_pallas"]


from tpufem.utils.pallas_ctx import trace_ctx as _trace_ctx


def node_coords_embedded(mesh: Mesh, plan: StructuredPlan,
                         dtype=np.float32) -> np.ndarray:
    """[dim, E0, E1, E2] node coordinates in the embedded layout."""
    info = plan.info
    coords_grid = np.moveaxis(
        mesh.coords.reshape(info.node_grid + (mesh.dim,)), -1, 0)
    return node_coords_embedded_from_grid(coords_grid, plan, dtype)


def node_coords_embedded_from_grid(coords_grid, plan: StructuredPlan,
                                   dtype=np.float32) -> np.ndarray:
    """Embedded node coords from a [dim, *node_grid] coordinate grid
    (mesh-free entry point for huge grids).

    Padding positions get index-proportional synthetic coordinates so any
    cell touching them still has finite, invertible geometry (its volume is
    masked to zero in the kernel).
    """
    info = plan.info
    ng = info.node_grid                      # (nz1, ny1, nx1) or (ny1, nx1)
    sg = plan.store_grid
    dim = coords_grid.shape[0]
    g = len(sg)
    out = np.empty((dim,) + tuple(sg), dtype)
    for d in range(dim):
        # grid axis of coordinate d: x varies along the last axis, y along
        # the one before, z first — broadcast assignment, no meshgrid
        # materialization (the f64 meshgrid alone cost ~4 s at 224^3)
        ax = g - 1 - d
        ramp = (np.arange(sg[ax], dtype=dtype) - 1.0).reshape(
            (1,) * ax + (sg[ax],) + (1,) * (g - 1 - ax))
        out[d] = ramp
    valid = (slice(None),) + tuple(slice(1, 1 + ng[d]) for d in range(g))
    out[valid] = coords_grid
    return out


def _det_inv_3x3(J, valid):
    c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
    c01 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
    c02 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
    det = J[0][0] * c00 + J[0][1] * c01 + J[0][2] * c02
    # cells straddling the synthetic-padding seam can be degenerate; their
    # volumes are masked to zero, but 1/det must stay finite
    inv_det = jnp.where(valid, 1.0, 0.0) / jnp.where(
        valid, det, jnp.ones_like(det))
    c10 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
    c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
    c12 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
    c20 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
    c21 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
    c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
    inv = [[c00 * inv_det, c10 * inv_det, c20 * inv_det],
           [c01 * inv_det, c11 * inv_det, c21 * inv_det],
           [c02 * inv_det, c12 * inv_det, c22 * inv_det]]
    return det, inv


def _roll_x(x, dx):
    """out[..., pos] = x[..., pos - dx] (dx >= 0 roll right on lanes)."""
    if dx:
        # int32 shift: Mosaic's dynamic_rotate rejects i64 (which a bare
        # Python int becomes when jax_enable_x64 is on)
        return pltpu.roll(x, jnp.int32(dx), x.ndim - 1)
    return x


def _shift_x(x, dx):
    """out[..., pos] = x[..., pos + dx] — lane shift left by dx >= 0."""
    if dx:
        return pltpu.roll(x, jnp.int32((-dx) % x.shape[-1]), x.ndim - 1)
    return x


def _kernel(c00, c01, c02, c10, c11, c12, c20, c21, c22,
            data_ref, rhs_ref, *, plan_tables, offsets_grid, Bz, By,
            node_max, phi, wq, f_planes, dim, npe, num_types,
            apply_bc=True, rhs_mode="interp", zbase_ref=None):
    """(z-block zi, y-block yj): build output rows [zi*Bz, +Bz) x
    [yj*By, +By) x full x of the embedded system.

    cIJ: coordinate blocks [dim, Bz, By, E2] at (z-block zi+I-1 clamped,
    y-block yj+J-1 clamped).
    """
    zi = pl.program_id(0)
    yj = pl.program_id(1)
    # global z-block origin: shard-local program id + traced shard offset
    # (SMEM scalar, sharded assembly) — 0 on a single chip
    z0g = zi * Bz if zbase_ref is None else zi * Bz + zbase_ref[0]

    # haloed slab [dim, Bz+2, By+2, E2]: store rows [zi*Bz-1, zi*Bz+Bz+1) x
    # [yj*By-1, yj*By+By+1)
    def yext(a, b, c):
        return jnp.concatenate([a[:, :, -1:], b[...], c[:, :, :1]], axis=2)

    row_m = yext(c00, c01, c02)
    row_0 = yext(c10, c11, c12)
    row_p = yext(c20, c21, c22)
    slab = jnp.concatenate([row_m[:, -1:], row_0, row_p[:, :1]], axis=1)

    e2 = slab.shape[-1]
    Bzp1, Byp1 = Bz + 1, By + 1

    # corner-shifted coordinate planes shared across element types: value at
    # a cell position = coordinate of the cell's (oz, oy, ox) corner node.
    # Cell (cz, cy) sits at slab position (cz + 2 - zi*Bz, cy + 2 - yj*By);
    # cells needed: [zi*Bz - 2, zi*Bz + Bz - 1) x [yj*By - 2, yj*By + By - 1).
    corner = {}
    for oz in (0, 1):
        for oy in (0, 1):
            for ox in (0, 1):
                planes = []
                for d in range(dim):
                    base = slab[d, oz:oz + Bzp1, oy:oy + Byp1]
                    planes.append(_shift_x(base, ox))
                corner[(oz, oy, ox)] = planes

    # cell validity from global indices
    shape_c = (Bzp1, Byp1, e2)
    gz = jax.lax.broadcasted_iota(jnp.int32, shape_c, 0) + z0g - 2
    gy = jax.lax.broadcasted_iota(jnp.int32, shape_c, 1) + yj * By - 2
    gx = jax.lax.broadcasted_iota(jnp.int32, shape_c, 2) - 1
    valid = ((gz >= 0) & (gz < node_max[0])
             & (gy >= 0) & (gy < node_max[1])
             & (gx >= 0) & (gx < node_max[2]))

    K = data_ref.shape[0]
    out_dtype = slab.dtype
    for k in range(K):
        data_ref[k] = jnp.zeros((Bz, By, e2), out_dtype)
    rhs_ref[...] = jnp.zeros((Bz, By, e2), out_dtype)

    corner_f = None
    if rhs_mode == "interp":
        # product approximation: f evaluated ONCE per node position on the
        # haloed slab; the load is adet * Mref @ f(vertices), with Mref the
        # constant reference mass matrix (exact for P1-interpolated f, the
        # textbook O(h^2)-optimal load) — replaces num_types*Q f evals.
        fslab = f_planes(*[slab[d] for d in range(dim)])
        corner_f = {}
        for oz in (0, 1):
            for oy in (0, 1):
                for ox in (0, 1):
                    corner_f[(oz, oy, ox)] = _shift_x(
                        fslab[oz:oz + Bzp1, oy:oy + Byp1], ox)
        mref = [[(2.0 if a == b else 1.0) / 120.0 for b in range(npe)]
                for a in range(npe)]

    for t in range(num_types):
        entry_k, node_off = plan_tables[t]
        Xt = [corner[node_off[n_]] for n_ in range(npe)]
        J = [[Xt[m][d] - Xt[npe - 1][d] for m in range(dim)]
             for d in range(dim)]
        det, inv = _det_inv_3x3(J, valid)
        adet = jnp.where(valid, jnp.abs(det), 0.0)
        vol = adet * (1.0 / 6.0)
        G = [[inv[n_][d] for d in range(dim)] for n_ in range(dim)]
        G.append([-sum(inv[n_][d] for n_ in range(dim))
                  for d in range(dim)])

        facc = [None] * npe
        if rhs_mode == "interp":
            fv = [corner_f[node_off[n_]] for n_ in range(npe)]
            for a in range(npe):
                facc[a] = sum(mref[a][b] * fv[b] for b in range(npe))
        else:
            for q in range(len(wq)):
                xq = [sum(phi[q][n_] * Xt[n_][d] for n_ in range(npe))
                      for d in range(dim)]
                fq = f_planes(*xq)
                for a in range(npe):
                    w = wq[q] * phi[q][a]
                    facc[a] = (fq * w if facc[a] is None
                               else facc[a] + fq * w)

        for a in range(npe):
            oz, oy, ox = node_off[a]
            # contribution of cell (cz, cy) lands on output row
            # (cz + oz + 1 - zi*Bz, cy + oy + 1 - yj*By): z/y are slices,
            # x is a roll (wraparound hits zero-coefficient borders).
            zsl = slice(1 - oz, 1 - oz + Bz)
            ysl = slice(1 - oy, 1 - oy + By)
            for b in range(npe):
                k = entry_k[a][b]
                ke = sum(G[a][d] * G[b][d] for d in range(dim)) * vol
                data_ref[k] = data_ref[k] + _roll_x(ke[zsl, ysl], ox)
            la = (facc[a] * adet)[zsl, ysl]
            rhs_ref[...] = rhs_ref[...] + _roll_x(la, ox)

    if not apply_bc:
        return
    # zero-Dirichlet on the box boundary, masks from global node indices
    shape_o = (Bz, By, e2)
    nz_ = jax.lax.broadcasted_iota(jnp.int32, shape_o, 0) + z0g - 1
    ny_ = jax.lax.broadcasted_iota(jnp.int32, shape_o, 1) + yj * By - 1
    nx_ = jax.lax.broadcasted_iota(jnp.int32, shape_o, 2) - 1

    def bc_of(z, y, x):
        inside = ((z >= 0) & (z <= node_max[0]) & (y >= 0)
                  & (y <= node_max[1]) & (x >= 0) & (x <= node_max[2]))
        on_bd = ((z == 0) | (z == node_max[0]) | (y == 0)
                 | (y == node_max[1]) | (x == 0) | (x == node_max[2]))
        return (inside & on_bd).astype(out_dtype)

    bc_row = bc_of(nz_, ny_, nx_)
    keep_row = 1.0 - bc_row
    for k in range(K):
        dz, dy, dx = offsets_grid[k]
        bc_col = bc_of(nz_ + dz, ny_ + dy, nx_ + dx)
        dk = data_ref[k] * keep_row * (1.0 - bc_col)
        if dz == 0 and dy == 0 and dx == 0:
            dk = dk + bc_row
        data_ref[k] = dk
    rhs_ref[...] = rhs_ref[...] * keep_row


def _det_inv_2x2(J, valid):
    det = J[0][0] * J[1][1] - J[0][1] * J[1][0]
    inv_det = jnp.where(valid, 1.0, 0.0) / jnp.where(
        valid, det, jnp.ones_like(det))
    inv = [[J[1][1] * inv_det, -J[0][1] * inv_det],
           [-J[1][0] * inv_det, J[0][0] * inv_det]]
    return det, inv


def _kernel_2d(cm, c0, cp, data_ref, rhs_ref, *, plan_tables, offsets_grid,
               By, node_max, phi, wq, f_planes, npe, num_types, apply_bc,
               rhs_mode="interp"):
    """y-block yi: build output rows [yi*By, +By) x full x of the embedded
    2D system.  cm/c0/cp: coordinate blocks [dim, By, E1] at y-blocks
    yi-1/yi/yi+1 (clamped)."""
    yi = pl.program_id(0)
    dim = 2

    # haloed slab [dim, By+2, E1]
    slab = jnp.concatenate([cm[:, -1:], c0[...], cp[:, :1]], axis=1)
    e1 = slab.shape[-1]
    Byp1 = By + 1

    corner = {}
    for oy in (0, 1):
        for ox in (0, 1):
            planes = []
            for d in range(dim):
                base = slab[d, oy:oy + Byp1]
                planes.append(_shift_x(base, ox))
            corner[(oy, ox)] = planes

    shape_c = (Byp1, e1)
    gy = jax.lax.broadcasted_iota(jnp.int32, shape_c, 0) + yi * By - 2
    gx = jax.lax.broadcasted_iota(jnp.int32, shape_c, 1) - 1
    valid = ((gy >= 0) & (gy < node_max[0])
             & (gx >= 0) & (gx < node_max[1]))

    K = data_ref.shape[0]
    out_dtype = slab.dtype
    for k in range(K):
        data_ref[k] = jnp.zeros((By, e1), out_dtype)
    rhs_ref[...] = jnp.zeros((By, e1), out_dtype)

    corner_f = None
    if rhs_mode == "interp":
        fslab = f_planes(*[slab[d] for d in range(dim)])
        corner_f = {}
        for oy in (0, 1):
            for ox in (0, 1):
                corner_f[(oy, ox)] = _shift_x(fslab[oy:oy + Byp1], ox)
        mref = [[(2.0 if a == b else 1.0) / 24.0 for b in range(npe)]
                for a in range(npe)]

    for t in range(num_types):
        entry_k, node_off = plan_tables[t]
        Xt = [corner[node_off[n_]] for n_ in range(npe)]
        J = [[Xt[m][d] - Xt[npe - 1][d] for m in range(dim)]
             for d in range(dim)]
        det, inv = _det_inv_2x2(J, valid)
        adet = jnp.where(valid, jnp.abs(det), 0.0)
        area = adet * 0.5
        G = [[inv[n_][d] for d in range(dim)] for n_ in range(dim)]
        G.append([-sum(inv[n_][d] for n_ in range(dim))
                  for d in range(dim)])

        facc = [None] * npe
        if rhs_mode == "interp":
            fv = [corner_f[node_off[n_]] for n_ in range(npe)]
            for a in range(npe):
                facc[a] = sum(mref[a][b] * fv[b] for b in range(npe))
        else:
            for q in range(len(wq)):
                xq = [sum(phi[q][n_] * Xt[n_][d] for n_ in range(npe))
                      for d in range(dim)]
                fq = f_planes(*xq)
                for a in range(npe):
                    w = wq[q] * phi[q][a]
                    facc[a] = (fq * w if facc[a] is None
                               else facc[a] + fq * w)

        for a in range(npe):
            oy, ox = node_off[a]
            ysl = slice(1 - oy, 1 - oy + By)
            for b in range(npe):
                k = entry_k[a][b]
                ke = sum(G[a][d] * G[b][d] for d in range(dim)) * area
                data_ref[k] = data_ref[k] + _roll_x(ke[ysl], ox)
            la = (facc[a] * adet)[ysl]
            rhs_ref[...] = rhs_ref[...] + _roll_x(la, ox)

    if not apply_bc:
        return
    shape_o = (By, e1)
    ny_ = jax.lax.broadcasted_iota(jnp.int32, shape_o, 0) + yi * By - 1
    nx_ = jax.lax.broadcasted_iota(jnp.int32, shape_o, 1) - 1

    def bc_of(y, x):
        inside = ((y >= 0) & (y <= node_max[0])
                  & (x >= 0) & (x <= node_max[1]))
        on_bd = ((y == 0) | (y == node_max[0])
                 | (x == 0) | (x == node_max[1]))
        return (inside & on_bd).astype(out_dtype)

    bc_row = bc_of(ny_, nx_)
    keep_row = 1.0 - bc_row
    for k in range(K):
        dy, dx = offsets_grid[k]
        bc_col = bc_of(ny_ + dy, nx_ + dx)
        dk = data_ref[k] * keep_row * (1.0 - bc_col)
        if dy == 0 and dx == 0:
            dk = dk + bc_row
        data_ref[k] = dk
    rhs_ref[...] = rhs_ref[...] * keep_row


def _build_2d(plan, C_emb, f_planes, rule, apply_bc, rhs_mode, interpret):
    info = plan.info
    sg = plan.store_grid
    K = plan.width
    npe = 3
    T = info.num_types
    By = 8 if sg[0] % 8 == 0 else sg[0]
    nyb = sg[0] // By

    from tpufem.fem.elements import P1Triangle

    el = P1Triangle()
    phi = [[float(v) for v in row] for row in el.shape_values(rule.points)]
    wq = [float(w) for w in rule.weights]
    plan_tables = []
    for t in range(T):
        entry_k = [[int(plan.entry_k[t, a, b]) for b in range(npe)]
                   for a in range(npe)]
        node_off = [tuple(int(v) for v in info.type_node_offsets[t, a])
                    for a in range(npe)]
        plan_tables.append((entry_k, node_off))
    node_max = (info.node_grid[0] - 1, info.node_grid[1] - 1)

    kern = functools.partial(
        _kernel_2d, plan_tables=plan_tables,
        offsets_grid=tuple(tuple(int(v) for v in o)
                           for o in plan.offsets_grid),
        By=By, node_max=node_max, phi=phi, wq=wq, f_planes=f_planes,
        npe=npe, num_types=T, apply_bc=apply_bc, rhs_mode=rhs_mode)

    cblock = (2, By, sg[1])

    def cmap(dj):
        def m(yi):
            return (0, jnp.clip(yi + dj, 0, nyb - 1), 0)
        return m

    in_specs = [pl.BlockSpec(cblock, cmap(dj), memory_space=pltpu.VMEM)
                for dj in (-1, 0, 1)]
    with _trace_ctx(C_emb.dtype):
        data, rhs = pl.pallas_call(
            kern,
            grid=(nyb,),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((K, By, sg[1]), lambda yi: (0, yi, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((By, sg[1]), lambda yi: (yi, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((K,) + tuple(sg), C_emb.dtype),
                jax.ShapeDtypeStruct(tuple(sg), C_emb.dtype),
            ),
            interpret=interpret,
        )(C_emb, C_emb, C_emb)
    n = int(np.prod(sg))
    return StencilMatrix(data.reshape(K, n), plan.offsets), rhs.reshape(-1)


def _pick_blocks(sg, K):
    """(Bz, By): block sizes dividing the store dims.

    Small fixed blocks keep every VMEM live value tiny (the Mosaic compiler
    dies silently on large per-step live sets); By must be a sublane-tile
    multiple (8), Bz anything dividing sg[0].  The live set scales with
    Bz*By*E2: 4x8 blocks fit up to E2 = 384 but exceed the 16 MB scoped
    VMEM limit at E2 = 512 (measured 20.98 MB at 392^2 x 512), so Bz
    halves once the block volume passes the measured-safe 12288 elements.
    """
    Bz = 4 if sg[0] % 4 == 0 else (2 if sg[0] % 2 == 0 else 1)
    By = 8 if sg[1] % 8 == 0 else sg[1]
    while Bz > 1 and Bz * By * sg[2] > 12288:
        Bz //= 2
    return Bz, By


def build_poisson_system_pallas(plan: StructuredPlan, C_emb, bc_mask=None,
                                f_planes=None, rule: QuadratureRule = None, *,
                                block_lead: int | None = None,
                                block_minor: int | None = None,
                                apply_bc: bool = True,
                                rhs_mode: str = "quadrature",
                                interpret: bool = False):
    """One-pass system build: (StencilMatrix, b), 2D or 3D structured.

    C_emb: node coords from ``node_coords_embedded``; ``bc_mask`` is accepted
    for API compatibility but unused — the kernel derives the box-boundary
    mask from grid indices.  f_planes(x, y[, z]) -> plane.

    ``apply_bc=False`` returns the raw (uneliminated) system so callers can
    impose general Dirichlet data via solve.bc.apply_dirichlet_stencil —
    one extra vectorized pass over the stencil data.

    ``rhs_mode``: "quadrature" (default) uses ``rule`` (parity with the
    element_load XLA path; degree 2 suffices for P1 — measured identical
    error to degree 3 at 10% less time); "interp" integrates the
    P1-interpolated load exactly — one f evaluation per node, still O(h^2),
    ~1.6x faster in the kernel but with a larger error constant
    (1.8e-4 -> 3.6e-4 on the n=96 model problem).
    """
    if not plan.embedded:
        raise ValueError("plan must be built with structured_plan(embed=True)")
    info = plan.info
    if len(info.node_grid) == 2:
        return _build_2d(plan, C_emb, f_planes, rule, apply_bc, rhs_mode,
                         interpret)
    if len(info.node_grid) != 3:
        raise NotImplementedError("fused system build is 2D/3D structured")
    sg = plan.store_grid
    K = plan.width
    dim = 3
    npe = 4
    T = info.num_types
    auto_bz, auto_by = _pick_blocks(sg, K)
    Bz = block_lead if block_lead is not None else auto_bz
    By = block_minor if block_minor is not None else auto_by
    if sg[0] % Bz or sg[1] % By:
        raise ValueError(f"store dims {sg} not divisible by blocks "
                         f"({Bz}, {By})")
    nzb, nyb = sg[0] // Bz, sg[1] // By

    from tpufem.fem.elements import P1Tetrahedron

    el = P1Tetrahedron()
    phi = [[float(v) for v in row] for row in el.shape_values(rule.points)]
    wq = [float(w) for w in rule.weights]

    plan_tables = []
    for t in range(T):
        entry_k = [[int(plan.entry_k[t, a, b]) for b in range(npe)]
                   for a in range(npe)]
        node_off = [tuple(int(v) for v in info.type_node_offsets[t, a])
                    for a in range(npe)]
        plan_tables.append((entry_k, node_off))

    # node index maxima (node coords run 0..n per axis, z/y/x order)
    node_max = (info.node_grid[0] - 1, info.node_grid[1] - 1,
                info.node_grid[2] - 1)

    kern = functools.partial(
        _kernel, plan_tables=plan_tables,
        offsets_grid=tuple(tuple(int(v) for v in o)
                           for o in plan.offsets_grid),
        Bz=Bz, By=By, node_max=node_max,
        phi=phi, wq=wq, f_planes=f_planes, dim=dim, npe=npe, num_types=T,
        apply_bc=apply_bc, rhs_mode=rhs_mode)

    cblock = (dim, Bz, By, sg[2])

    def cmap(di, dj):
        def m(zi, yj):
            z = jnp.clip(zi + di, 0, nzb - 1)
            y = jnp.clip(yj + dj, 0, nyb - 1)
            return (0, z, y, 0)
        return m

    in_specs = [pl.BlockSpec(cblock, cmap(di, dj), memory_space=pltpu.VMEM)
                for di in (-1, 0, 1) for dj in (-1, 0, 1)]

    # x64 off while tracing: i64 grid indices break Mosaic (see
    # stencil_pallas._stencil_call)
    with _trace_ctx(C_emb.dtype):
        data, rhs = pl.pallas_call(
            kern,
            grid=(nzb, nyb),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((K, Bz, By, sg[2]), lambda zi, yj: (0, zi, yj, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bz, By, sg[2]), lambda zi, yj: (zi, yj, 0),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((K,) + tuple(sg), C_emb.dtype),
                jax.ShapeDtypeStruct(tuple(sg), C_emb.dtype),
            ),
            interpret=interpret,
        )(*([C_emb] * 9))
    n = int(np.prod(sg))
    return StencilMatrix(data.reshape(K, n), plan.offsets), rhs.reshape(-1)
