"""Pallas TPU kernel: single-pass Poisson system build (3D structured).

Reads *node coordinates only* — 3 planes instead of the 72 element-coord
planes (element corners are recovered by in-VMEM shifts, since on a
structured mesh every element's vertices are fixed grid offsets of its base
node) — and emits the complete solver-ready system in one pass:

    stiffness (embedded stencil data)  +  RHS load vector
    +  zero-Dirichlet boundary elimination

HBM traffic: ~3 node-coordinate planes in (x3 for the leading-halo neighbor
blocks), K stencil planes + 1 RHS plane out — about 115 MB at 1M DOFs versus
~1.5 GB for the unfused XLA pipeline.  Everything else (geometry, 96 local
-matrix entries per cell, quadrature, masking) happens in VMEM.

Contracts:
  * ``node_coords_embedded`` layout: [dim, E0, E1, E2] with node (z, y, x)
    at (z+1, y+1, x+1); out-of-range positions carry synthetic index-valued
    coordinates (finite, nondegenerate geometry), masked out by validity.
  * zero Dirichlet data only (the reference's model problem); nonzero g goes
    through the XLA path (tpufem.solve.bc).
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
from tpufem.ops.stencil_pallas import _shifted
from tpufem.sparse.stencil import StencilMatrix

__all__ = ["node_coords_embedded", "build_poisson_system_pallas"]


def node_coords_embedded(mesh: Mesh, plan: StructuredPlan,
                         dtype=np.float32) -> np.ndarray:
    """[dim, E0, E1, E2] node coordinates in the embedded layout.

    Padding positions get index-proportional synthetic coordinates so any
    cell touching them still has finite, invertible geometry (its volume is
    masked to zero in the kernel).
    """
    info = plan.info
    coords_grid = np.moveaxis(
        mesh.coords.reshape(info.node_grid + (mesh.dim,)), -1, 0)
    return node_coords_embedded_from_grid(coords_grid, plan, dtype)


def node_coords_embedded_from_grid(coords_grid, plan: StructuredPlan,
                                   dtype=np.float32) -> np.ndarray:
    """Embedded node coords from a [dim, *node_grid] coordinate grid
    (mesh-free entry point for huge grids)."""
    info = plan.info
    ng = info.node_grid                      # (nz1, ny1, nx1)
    sg = plan.store_grid
    dim = coords_grid.shape[0]
    # synthetic background: index-valued coordinates per axis
    axes = [np.arange(sg[d], dtype=np.float64) - 1.0 for d in range(3)]
    out = np.zeros((dim,) + tuple(sg), dtype)
    Z, Y, X = np.meshgrid(axes[0], axes[1], axes[2], indexing="ij")
    idx_planes = [Z, Y, X]
    for d in range(dim):
        # grid axis of coordinate d: x varies along axis 2, y along 1, z 0
        out[d] = idx_planes[2 - d]
    out[:, 1:1 + ng[0], 1:1 + ng[1], 1:1 + ng[2]] = coords_grid
    return out


def _det_inv_3x3(J, valid=None):
    c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
    c01 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
    c02 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
    det = J[0][0] * c00 + J[0][1] * c01 + J[0][2] * c02
    if valid is not None:
        # cells straddling the synthetic-padding seam can be degenerate;
        # their volumes are masked to zero, but 1/det must stay finite
        inv_det = jnp.where(valid, 1.0, 0.0) / jnp.where(
            valid, det, jnp.ones_like(det))
    else:
        inv_det = 1.0 / det
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


def _place(x, dz_unused, dy, dx):
    """out[pos] = x[pos - d] per minor axis (roll right/down by d >= 0)."""
    out = x
    if dy:
        out = pltpu.roll(out, dy, 1)
    if dx:
        out = pltpu.roll(out, dx, 2)
    return out


def _kernel(cm_ref, c0_ref, cp_ref, bm_ref, b0_ref, bp_ref,
            data_ref, rhs_ref, *, plan_tables, offsets_grid, block_lead,
            cell_grid, phi, wq, f_planes, dim, npe, num_types):
    B = block_lead
    zi = pl.program_id(0)

    # node-coordinate slab: C rows [zi*B - 1, zi*B + B + 1)  (B+2 rows)
    slab = jnp.concatenate(
        [cm_ref[:, -1:], c0_ref[...], cp_ref[:, :1]], axis=1)
    # bc slab, same rows
    bslab = jnp.concatenate(
        [bm_ref[-1:], b0_ref[...], bp_ref[:1]], axis=0)

    e1, e2 = slab.shape[-2], slab.shape[-1]
    Bp1 = B + 1

    # corner-shifted coordinate planes, shared by every element type:
    # P[(oz, oy, ox)][d] has, at cell position, the coordinate of the
    # cell's (oz, oy, ox) corner node.  Cell cz occupies slab rows
    # s = (cz - zi*B + 2); cells [zi*B - 2, zi*B + B - 1).
    corner = {}
    for oz in (0, 1):
        for oy in (0, 1):
            for ox in (0, 1):
                planes = []
                for d in range(dim):
                    base = jax.lax.slice_in_dim(slab[d], oz, oz + Bp1, axis=0)
                    planes.append(_shifted(base, (oy, ox)))
                corner[(oz, oy, ox)] = planes

    # validity of cells
    gz = (jax.lax.broadcasted_iota(jnp.int32, (Bp1, e1, e2), 0)
          + zi * B - 2)
    py = jax.lax.broadcasted_iota(jnp.int32, (Bp1, e1, e2), 1)
    px = jax.lax.broadcasted_iota(jnp.int32, (Bp1, e1, e2), 2)
    valid = ((gz >= 0) & (gz < cell_grid[0])
             & (py >= 1) & (py <= cell_grid[1])
             & (px >= 1) & (px <= cell_grid[2]))

    # accumulate directly in the output VMEM blocks (they are step-local
    # scratch until written back), keeping the live set small
    K = data_ref.shape[0]
    for k in range(K):
        data_ref[k] = jnp.zeros((B, e1, e2), dtype=slab.dtype)
    rhs_ref[...] = jnp.zeros((B, e1, e2), dtype=slab.dtype)

    for t in range(num_types):
        entry_k, node_off = plan_tables[t]
        Xt = [corner[node_off[n_]] for n_ in range(npe)]   # [npe][dim] planes
        J = [[Xt[m][d] - Xt[npe - 1][d] for m in range(dim)]
             for d in range(dim)]
        det, inv = _det_inv_3x3(J, valid)
        adet = jnp.where(valid, jnp.abs(det), 0.0)   # for quadrature loads
        vol = adet * (1.0 / 6.0)                     # reference-tet measure
        G = [[inv[n_][d] for d in range(dim)] for n_ in range(dim)]
        G.append([-sum(inv[n_][d] for n_ in range(dim))
                  for d in range(dim)])

        # RHS quadrature: acc_a = sum_q w_q phi[q, a] f(x_q)
        facc = [None] * npe
        for q in range(len(wq)):
            xq = [sum(phi[q][n_] * Xt[n_][d] for n_ in range(npe))
                  for d in range(dim)]
            fq = f_planes(*xq)
            for a in range(npe):
                w = wq[q] * phi[q][a]
                facc[a] = fq * w if facc[a] is None else facc[a] + fq * w

        for a in range(npe):
            oz, oy, ox = node_off[a]
            # stiffness contributions of row a
            for b in range(npe):
                k = entry_k[a][b]
                ke = sum(G[a][d] * G[b][d] for d in range(dim)) * vol
                contrib = jax.lax.slice_in_dim(ke, 1 - oz, 1 - oz + B, axis=0)
                data_ref[k] = data_ref[k] + _place(contrib, 0, oy, ox)
            # load contribution of row a (weights already sum to 1/6)
            la = facc[a] * adet
            lc = jax.lax.slice_in_dim(la, 1 - oz, 1 - oz + B, axis=0)
            rhs_ref[...] = rhs_ref[...] + _place(lc, 0, oy, ox)

    # zero-Dirichlet elimination via 0/1 float masks (bc blocks are float):
    # keep = (1 - bc_row)(1 - bc_col); identity diagonal re-added as +bc_row
    bc_row = jax.lax.slice_in_dim(bslab, 1, 1 + B, axis=0)
    keep_row = 1.0 - bc_row
    for k in range(K):
        dz, dy, dx = offsets_grid[k]
        base = jax.lax.slice_in_dim(bslab, 1 + dz, 1 + dz + B, axis=0)
        bc_col = _shifted(base, (dy, dx))
        dk = data_ref[k] * keep_row * (1.0 - bc_col)
        if dz == 0 and dy == 0 and dx == 0:
            dk = dk + bc_row
        data_ref[k] = dk
    rhs_ref[...] = rhs_ref[...] * keep_row


def build_poisson_system_pallas(plan: StructuredPlan, C_emb, bc_mask,
                                f_planes, rule: QuadratureRule, *,
                                block_lead: int = 1,
                                interpret: bool = False):
    """One-pass system build: (StencilMatrix, b) with zero-Dirichlet BC.

    C_emb: node coords from ``node_coords_embedded``; bc_mask: embedded bool
    [num_store_rows]; f_planes(x, y, z) -> plane.  3D structured only.
    """
    if not plan.embedded:
        raise ValueError("plan must be built with structured_plan(embed=True)")
    info = plan.info
    if len(info.node_grid) != 3:
        raise NotImplementedError("fused system build is 3D-only")
    sg = plan.store_grid
    K = plan.width
    dim = 3
    npe = 4
    T = info.num_types
    if sg[0] % block_lead:
        raise ValueError("store leading dim not divisible by block_lead")
    nblk = sg[0] // block_lead

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

    bc_grid = jnp.asarray(bc_mask, C_emb.dtype).reshape(sg)  # 0/1 float mask
    zeros3 = (0, 0, 0)
    cblock = (dim, block_lead) + tuple(sg[1:])
    bblock = (block_lead,) + tuple(sg[1:])

    kern = functools.partial(
        _kernel, plan_tables=plan_tables,
        offsets_grid=tuple(tuple(int(v) for v in o)
                           for o in plan.offsets_grid),
        block_lead=block_lead,
        cell_grid=tuple(int(c) for c in info.cell_grid),
        phi=phi, wq=wq, f_planes=f_planes, dim=dim, npe=npe, num_types=T)

    def prev(i):
        return (0, jnp.maximum(i - 1, 0)) + (0, 0)

    def cur(i):
        return (0, i) + (0, 0)

    def nxt(i):
        return (0, jnp.minimum(i + 1, nblk - 1)) + (0, 0)

    def bprev(i):
        return (jnp.maximum(i - 1, 0),) + zeros3[:2]

    def bcur(i):
        return (i,) + zeros3[:2]

    def bnxt(i):
        return (jnp.minimum(i + 1, nblk - 1),) + zeros3[:2]

    data, rhs = pl.pallas_call(
        kern,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(cblock, prev, memory_space=pltpu.VMEM),
            pl.BlockSpec(cblock, cur, memory_space=pltpu.VMEM),
            pl.BlockSpec(cblock, nxt, memory_space=pltpu.VMEM),
            pl.BlockSpec(bblock, bprev, memory_space=pltpu.VMEM),
            pl.BlockSpec(bblock, bcur, memory_space=pltpu.VMEM),
            pl.BlockSpec(bblock, bnxt, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((K,) + bblock, lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bblock, bcur, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((K,) + tuple(sg), C_emb.dtype),
            jax.ShapeDtypeStruct(tuple(sg), C_emb.dtype),
        ),
        interpret=interpret,
    )(C_emb, C_emb, C_emb, bc_grid, bc_grid, bc_grid)
    n = int(np.prod(sg))
    return StencilMatrix(data.reshape(K, n), plan.offsets), rhs.reshape(-1)
