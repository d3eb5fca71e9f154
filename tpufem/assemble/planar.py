"""Batch-trailing ("planar") element kernels: the TPU-native hot path.

TPU arrays tile as (8 sublanes x 128 lanes) on the two minor dims.  The
textbook FEM layout [NE, npe, dim] pads its tiny trailing dims to full tiles
(~40x wasted HBM traffic, measured); the rest of the framework keeps that
layout for generality, but the production pipeline stores everything
*batch-trailing*:

    coords   X  [T, npe, dim, *grid]    (T = element types per cell)
    stiffness K [T, npe, npe, *grid]
    loads    b  [T, npe, *grid]

so the minor axes are the large grid axes and every op is an elementwise VPU
stream at full bandwidth.  This is the same reasoning as the reference's SoA
X/Y arrays (/root/reference/fea_test.cu:270-288) taken to its TPU conclusion.

All kernels here are small python loops over npe/dim emitting elementwise
jnp ops on [*grid] planes — no dot_generals, exact fp32, instant compiles.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpufem.fem.quadrature import QuadratureRule
from tpufem.mesh.core import Mesh

__all__ = ["element_coords_bt", "p1_stiffness_bt", "element_load_bt"]

_REF_VOLUME = {"triangle": 0.5, "tetrahedron": 1.0 / 6.0}


def element_coords_bt(mesh: Mesh, dtype=np.float32) -> np.ndarray:
    """[T, npe, dim, *cell_grid] element coordinates (host numpy).

    Element order matches the generators (cell-major, T interleaved), so
    plane [t, n, d] is the (n, d)-coordinate of type-t elements on the cell
    grid.
    """
    info = mesh.structured
    if info is None:
        raise ValueError("mesh has no structured-grid metadata")
    T = info.num_types
    npe = mesh.nodes_per_element
    ec = mesh.element_coords()                      # [NE, npe, dim]
    ne = ec.shape[0]
    ec = ec.reshape(*info.cell_grid, T, npe, mesh.dim)
    # -> [T, npe, dim, *cell_grid]
    g = len(info.cell_grid)
    perm = (g, g + 1, g + 2) + tuple(range(g))
    return np.ascontiguousarray(np.transpose(ec, perm), dtype=dtype)


def _det_inv_2x2(J):
    det = J[0][0] * J[1][1] - J[0][1] * J[1][0]
    inv_det = 1.0 / det
    inv = [[J[1][1] * inv_det, -J[0][1] * inv_det],
           [-J[1][0] * inv_det, J[0][0] * inv_det]]
    return det, inv


def _det_inv_3x3(J):
    c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
    c01 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
    c02 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
    det = J[0][0] * c00 + J[0][1] * c01 + J[0][2] * c02
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


def _geometry_bt(Xt, dim):
    """Xt: indexable [npe][dim] of [*B] planes. Returns (G [npe][dim] planes,
    |det| plane).  Same math as assemble.local.affine_geometry, elementwise."""
    npe = dim + 1
    # J[d][m] = x[m][d] - x[last][d]
    J = [[Xt[m][d] - Xt[npe - 1][d] for m in range(dim)] for d in range(dim)]
    det, inv = (_det_inv_2x2(J) if dim == 2 else _det_inv_3x3(J))
    # G[n][d] = invJ[n][d] for n < dim; G[last][d] = -sum_n
    G = [[inv[n][d] for d in range(dim)] for n in range(dim)]
    G.append([-sum(inv[n][d] for n in range(dim)) for d in range(dim)])
    return G, jnp.abs(det)


def p1_stiffness_bt(X, cell_type: str):
    """X [T, npe, dim, *B] -> Ke [T, npe, npe, *B] (P1 Poisson stiffness)."""
    T, npe, dim = X.shape[0], X.shape[1], X.shape[2]
    Xviews = [[[X[t, n, d] for d in range(dim)] for n in range(npe)]
              for t in range(T)]
    return p1_stiffness_views(Xviews, cell_type)


def p1_stiffness_views(Xviews, cell_type: str):
    """Like p1_stiffness_bt, but takes nested lists Xviews[t][n][d] of [*B]
    planes — lets structured-grid callers pass zero-copy slicing views of
    the node-coordinate grid instead of materializing element coords
    (3+ GB at 10M DOFs)."""
    T = len(Xviews)
    npe = len(Xviews[0])
    dim = len(Xviews[0][0])
    refvol = _REF_VOLUME[cell_type]
    out_t = []
    for t in range(T):
        G, adet = _geometry_bt(Xviews[t], dim)
        vol = adet * refvol
        rows = []
        for a in range(npe):
            row = []
            for b in range(npe):
                row.append(sum(G[a][d] * G[b][d] for d in range(dim)) * vol)
            rows.append(jnp.stack(row))
        out_t.append(jnp.stack(rows))
    return jnp.stack(out_t)


def element_load_views(Xviews, cell_type: str, rule: QuadratureRule,
                       f_planes):
    """element_load_bt on nested coordinate views (zero-copy, huge grids)."""
    from tpufem.fem.elements import element_for_cell

    T = len(Xviews)
    npe = len(Xviews[0])
    dim = len(Xviews[0][0])
    el = element_for_cell(cell_type, 1)
    phi = el.shape_values(rule.points)
    w = rule.weights
    out_t = []
    for t in range(T):
        Xt = Xviews[t]
        _, adet = _geometry_bt(Xt, dim)
        acc = [0.0] * npe
        for q in range(rule.num_points):
            xq = [sum(float(phi[q, n]) * Xt[n][d] for n in range(npe))
                  for d in range(dim)]
            fq = f_planes(*xq)
            for a in range(npe):
                acc[a] = acc[a] + (float(w[q]) * float(phi[q, a])) * fq
        out_t.append(jnp.stack([acc[a] * adet for a in range(npe)]))
    return jnp.stack(out_t)


def element_coord_views(coords_grid, info):
    """Zero-copy element-coordinate views from a node-coordinate grid.

    coords_grid: [dim, *node_grid]; returns Xviews[t][n][d] of [*cell_grid]
    slicing views (no gathers, no materialization).
    """
    cg = info.cell_grid
    out = []
    for t in range(info.num_types):
        nodes = []
        for n in range(info.type_node_offsets.shape[1]):
            off = info.type_node_offsets[t, n]
            sl = tuple(slice(int(off[d]), int(off[d]) + cg[d])
                       for d in range(len(cg)))
            nodes.append([coords_grid[d][sl]
                          for d in range(coords_grid.shape[0])])
        out.append(nodes)
    return out


def element_load_bt(X, cell_type: str, rule: QuadratureRule, f_planes):
    """X [T, npe, dim, *B] -> be [T, npe, *B]: b_a = sum_q w_q phi_a(q) f(x_q) |detJ|.

    ``f_planes(*coords)`` takes dim coordinate planes (each [*B]) and returns
    one plane — the batch-trailing form of the RHS coefficient (stacking a
    trailing dim-axis would reintroduce the tiny-minor-dim tiling waste).
    """
    T, npe, dim = X.shape[0], X.shape[1], X.shape[2]
    from tpufem.fem.elements import element_for_cell

    el = element_for_cell(cell_type, 1)
    phi = el.shape_values(rule.points)    # [Q, npe] numpy
    w = rule.weights
    out_t = []
    for t in range(T):
        Xt = [[X[t, n, d] for d in range(dim)] for n in range(npe)]
        _, adet = _geometry_bt(Xt, dim)
        # accumulate sum_q w_q phi_a(q) f(x(q)) over the static Q loop
        acc = [0.0] * npe
        for q in range(rule.num_points):
            xq = [sum(float(phi[q, n]) * Xt[n][d] for n in range(npe))
                  for d in range(dim)]
            fq = f_planes(*xq)
            for a in range(npe):
                acc[a] = acc[a] + (float(w[q]) * float(phi[q, a])) * fq
        out_t.append(jnp.stack([acc[a] * adet for a in range(npe)]))
    return jnp.stack(out_t)
