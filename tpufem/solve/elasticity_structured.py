"""3D elasticity at scale on structured boxes: analytic block-stencil path.

BASELINE.md config 4 at ~1M DOFs.  The generic BCSR pipeline
(solve/elasticity.py) materializes [NE, 12, 12] element matrices and
scatter-assembles them — 1.1 GB of intermediates and an XLA scatter at 2M
elements.  On a *uniform* box none of that is necessary:

  * every cell contributes the same [12, 12] vector element matrix, so the
    assembled operator is a 15-offset stencil of constant-per-offset 3x3
    blocks with boundary corrections — T*npe² block slice-adds on the host
    (microseconds), exactly like the scalar analytic multigrid levels;
  * the SpMV is  y_c = sum_k sum_d data[k, c, d] * shift(x_d, off_k) —
    135 shifted multiply-adds over embedded [NS] planes, zero gathers,
    zero index arrays (the vector extension of sparse/stencil.py);
  * the consistent RHS is the (also analytic) scalar mass stencil applied
    to the nodal body-force components;
  * block-Jacobi = precomputed 3x3 diagonal-block inverses, applied as 9
    more multiply-adds.

The displacement BC is clamped-zero on the whole box boundary (the vector
analogue of the reference model problem's Dirichlet rim).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.assemble.structured import StructuredPlan, structured_plan
from tpufem.solve.cg import CGResult, cg
from tpufem.solve.multigrid import (_embed_grid_numpy, _light_grid,
                                    _uniform_stencil_data)

__all__ = ["ElasticityBoxSolution", "uniform_cell_matrices",
           "elasticity_stencil_data", "block_stencil_matvec",
           "solve_elasticity_box", "manufactured_elasticity_3d",
           "build_elasticity_multigrid", "elastic_mg_preconditioner"]

_HI = jax.lax.Precision.HIGHEST


class ElasticityBoxSolution(NamedTuple):
    u: np.ndarray                  # [3, NN] displacement components
    cg: CGResult
    num_dofs: int
    node_grid: tuple


def uniform_cell_matrices(domain, s: int, lam: float, mu: float,
                          dtype=np.float64):
    """([T, 12, 12] elasticity Ke, [T, 4, 4] mass Me) of ONE cell."""
    from tpufem.assemble.local import element_mass
    from tpufem.fem.elements import P1Tetrahedron
    from tpufem.fem.quadrature import tetrahedron_rule
    from tpufem.fem.space import VectorFunctionSpace
    from tpufem.mesh.box import box_mesh
    from tpufem.solve.elasticity import elasticity_forms

    lo, hi = domain
    h = (hi - lo) / s
    mesh1 = box_mesh(lo, lo + h, lo, lo + h, lo, lo + h, 1, 1, 1)
    with jax.default_device(jax.devices("cpu")[0]):
        V = VectorFunctionSpace(mesh1, degree=1)
        wf = elasticity_forms(V, lam, mu)
        wf.dtype = jnp.float64
        ec = jnp.asarray(mesh1.element_coords(), jnp.float64)
        Ke = np.asarray(wf.element_matrices(ec), dtype)      # [6, 12, 12]
        Me = np.asarray(element_mass(ec, P1Tetrahedron(),
                                     tetrahedron_rule(2)), dtype)
    return Ke, Me


def elasticity_stencil_data(plan: StructuredPlan, Ke_one: np.ndarray,
                            dtype=np.float32) -> np.ndarray:
    """[K, 3, 3, NS] block-stencil data from one cell's [T, 12, 12] Ke.

    Constant slice-adds per (type, local row, local col) — the vector twin
    of tpufem.solve.multigrid._uniform_stencil_data.  DOF order inside Ke is
    node-major, component-minor (fem.space convention).
    """
    cell_grid = plan.info.cell_grid
    sg = plan.store_grid
    T = Ke_one.shape[0]
    npe = Ke_one.shape[1] // 3
    out = np.zeros((plan.width, 3, 3) + tuple(sg), np.float64)
    for t in range(T):
        for a in range(npe):
            for b in range(npe):
                k = int(plan.entry_k[t, a, b])
                sh = plan.entry_shift[t, a, b]
                sl = tuple(slice(int(sh[d]), int(sh[d]) + cell_grid[d])
                           for d in range(len(cell_grid)))
                blk = Ke_one[t, 3 * a:3 * a + 3, 3 * b:3 * b + 3]
                out[(k, slice(None), slice(None)) + sl] += \
                    blk[:, :, None, None, None]
    return out.reshape(plan.width, 3, 3, -1).astype(np.dtype(dtype))


def _apply_bc_blocks(data: np.ndarray, offsets, mask_flat: np.ndarray):
    """Clamped-boundary elimination on block-stencil data (numpy, host).

    Zero row/col blocks at masked nodes; identity diagonal block there.
    """
    n = data.shape[-1]
    halo = max(abs(o) for o in offsets)
    mp = np.pad(mask_flat, (halo, halo))
    keep = ~mask_flat
    for k, off in enumerate(offsets):
        col_bc = mp[halo + off: halo + off + n]
        live = (keep & ~col_bc)
        data[k] *= live
        if off == 0:
            for c in range(3):
                data[k, c, c] = np.where(mask_flat, 1.0, data[k, c, c])
    return data


def block_stencil_matvec(data, x, offsets):
    """y[c, i] = sum_k sum_d data[k, c, d, i] * x[d, i + off_k].

    data [K, 3, 3, NS], x [3, NS]; pure shifted multiply-adds (VPU
    streaming) — no gathers, the TPU-native BCSR SpMV for structured boxes.
    """
    n = x.shape[-1]
    halo = max(abs(int(o)) for o in offsets)
    xp = jnp.pad(x, ((0, 0), (halo, halo)))
    y = None
    for k, off in enumerate(offsets):
        xs = jax.lax.dynamic_slice(xp, (0, halo + int(off)), (3, n))
        contrib = (data[k] * xs[None, :, :]).sum(axis=1)     # [3, NS]
        y = contrib if y is None else y + contrib
    return y


import dataclasses


@dataclasses.dataclass
class ElasticMGLevel:
    """One vector-multigrid level (embedded layout, analytic assembly)."""
    plan: StructuredPlan
    data: jax.Array            # [K, 3, 3, NS]
    inv_blocks: jax.Array      # [3, 3, NS] inverted diagonal blocks
    bc_mask: jax.Array         # [NS]
    coarse_inverse: jax.Array  # dense [3*NN, 3*NN] on the coarsest, else None


# registered as a pytree so hierarchies pass through jit as ARGUMENTS —
# closing over level arrays bakes them into the HLO as constants, which
# blows the remote compiler's request size at ~1M DOFs (same lesson as
# solve.multigrid.MGLevel)
jax.tree_util.register_pytree_node(
    ElasticMGLevel,
    lambda l: ((l.data, l.inv_blocks, l.bc_mask, l.coarse_inverse),
               (l.plan,)),
    lambda aux, ch: ElasticMGLevel(plan=aux[0], data=ch[0],
                                   inv_blocks=ch[1], bc_mask=ch[2],
                                   coarse_inverse=ch[3]))


def _level_setup(domain, s, lam, mu, dtype):
    info, _, bc_grid = _light_grid(domain, s, 3, with_coords=False)
    plan = structured_plan(info, embed=True)
    Ke1, _ = uniform_cell_matrices(domain, s, lam, mu)
    data_np = elasticity_stencil_data(plan, Ke1, np.dtype(dtype).type)
    mask_np = _embed_grid_numpy(bc_grid, plan.store_grid, fill=False)
    data_np = _apply_bc_blocks(data_np, plan.offsets, mask_np)
    diag_k = plan.offsets.index(0)
    D = np.moveaxis(data_np[diag_k], -1, 0)
    sing = np.abs(np.linalg.det(D)) < 1e-30
    Dinv = np.linalg.inv(D + sing[:, None, None] * np.eye(3))
    Dinv = np.moveaxis(Dinv, 0, -1).astype(np.dtype(dtype).type)
    return plan, data_np, Dinv, mask_np


def build_elasticity_multigrid(domain, n_cells: int, *, lam: float,
                               mu: float, dtype=jnp.float32,
                               coarse_max: int = 8):
    """Analytic vector-MG hierarchy: per-level block-stencil operators,
    inverted diagonal blocks, dense inverse on the coarsest level.

    Transfers are the scalar P1 operators applied per displacement
    component (P1 interpolation reproduces rigid translations and all
    linear fields, so the elasticity near-kernel is preserved)."""
    sizes = [n_cells]
    while sizes[-1] % 2 == 0 and sizes[-1] > coarse_max:
        sizes.append(sizes[-1] // 2)
    levels = []
    for li, s in enumerate(sizes):
        plan, data_np, Dinv, mask_np = _level_setup(domain, s, lam, mu,
                                                    dtype)
        cinv = None
        if li == len(sizes) - 1:
            nn = int(np.prod(plan.info.node_grid))
            if 3 * nn <= 6000:
                cinv = _dense_block_inverse(plan, data_np)
        levels.append(ElasticMGLevel(
            plan=plan,
            data=jax.device_put(jnp.asarray(data_np)),
            inv_blocks=jax.device_put(jnp.asarray(Dinv)),
            bc_mask=jax.device_put(jnp.asarray(mask_np)),
            coarse_inverse=None if cinv is None
            else jax.device_put(jnp.asarray(cinv, dtype))))
    return levels


def _dense_block_inverse(plan: StructuredPlan, data_np) -> np.ndarray:
    """Dense inverse of the coarsest operator over VALID node DOFs,
    embedded back as a [3*NS, 3*NS]-acting map via node indexing."""
    from tpufem.solve.multigrid import _store_to_node_map

    node_of = _store_to_node_map(plan)         # [NS] -> node or -1
    ns = plan.num_store_rows
    nn = int(np.prod(plan.info.node_grid))
    n3 = 3 * nn
    dense = np.zeros((n3, n3), np.float64)
    idx = np.arange(ns)
    for k, off in enumerate(plan.offsets):
        cidx = idx + off
        ok = (cidx >= 0) & (cidx < ns)
        ri = node_of[idx]
        ci = node_of[np.clip(cidx, 0, ns - 1)]
        m = ok & (ri >= 0) & (ci >= 0)
        for c in range(3):
            for d in range(3):
                vals = data_np[k, c, d][m]
                nz = vals != 0
                np.add.at(dense, (3 * ri[m][nz] + c, 3 * ci[m][nz] + d),
                          vals[nz].astype(np.float64))
    return np.linalg.inv(dense)


def _grid3(plan, x_store):
    """[3, NS] embedded -> [3, *node_grid]."""
    ng = plan.info.node_grid
    return jnp.stack([plan.extract_field(x_store[c]).reshape(ng)
                      for c in range(3)])


def _store3(plan, x_grid):
    return jnp.stack([plan.embed_field(x_grid[c].reshape(-1))
                      for c in range(3)])


def elastic_v_cycle(levels, r, *, li: int = 0, nu1: int = 1, nu2: int = 1,
                    omega: float = 0.7):
    """One V-cycle for the block-stencil elasticity system. r: [3, NS]."""
    from tpufem.solve.multigrid import prolong, restrict

    lv = levels[li]
    offsets = lv.plan.offsets

    def matvec(x):
        return block_stencil_matvec(lv.data, x, offsets)

    def bsmooth(rr, e):
        resid = rr - matvec(e)
        return e + omega * (lv.inv_blocks * resid[None]).sum(axis=1)

    if li == len(levels) - 1:
        if lv.coarse_inverse is not None:
            nn = int(np.prod(lv.plan.info.node_grid))
            rg = _grid3(lv.plan, r).reshape(3, -1)     # [3, NN] node order
            rflat = jnp.moveaxis(rg, 0, 1).reshape(-1)  # node-major
            e = jnp.dot(lv.coarse_inverse.astype(r.dtype), rflat,
                        preferred_element_type=r.dtype)
            eg = jnp.moveaxis(e.reshape(nn, 3), 1, 0).reshape(
                (3,) + tuple(lv.plan.info.node_grid))
            return _store3(lv.plan, eg)
        e = omega * (lv.inv_blocks * r[None]).sum(axis=1)
        for _ in range(20):
            e = bsmooth(r, e)
        return e

    e = omega * (lv.inv_blocks * r[None]).sum(axis=1)
    for _ in range(nu1 - 1):
        e = bsmooth(r, e)

    resid = r - matvec(e)
    rg = _grid3(lv.plan, resid)
    rc_grid = jnp.stack([restrict(rg[c], 3) for c in range(3)])
    nxt = levels[li + 1]
    rc = _store3(nxt.plan, rc_grid)
    rc = jnp.where(nxt.bc_mask[None], 0.0, rc)

    ec = elastic_v_cycle(levels, rc, li=li + 1, nu1=nu1, nu2=nu2,
                         omega=omega)

    eg = _grid3(nxt.plan, ec)
    ef = jnp.stack([prolong(eg[c], 3) for c in range(3)])
    e = e + _store3(lv.plan, ef)

    for _ in range(nu2):
        e = bsmooth(r, e)
    return e


def elastic_mg_preconditioner(levels, *, nu1: int = 1, nu2: int = 1,
                              omega: float = 0.7):
    def apply(r):
        return elastic_v_cycle(levels, r, nu1=nu1, nu2=nu2, omega=omega)
    return apply


def manufactured_elasticity_3d(lam: float, mu: float, amp=(1.0, 0.7, -0.5)):
    """u_c = amp_c * phi, phi = prod(9 - x_d^2): (u_exact(x), f(x)) callables.

    f = -div sigma(u) = -(lam+mu) grad(div u) - mu laplace(u), evaluated
    analytically for the separable polynomial phi.
    """
    a = np.asarray(amp, np.float64)

    def parts(x, y, z):
        px, py, pz = 9.0 - x * x, 9.0 - y * y, 9.0 - z * z
        phi = px * py * pz
        d1 = np.stack([-2 * x * py * pz, -2 * y * px * pz,
                       -2 * z * px * py])                     # grad phi
        lap = -2.0 * (py * pz + px * pz + px * py)
        # Hessian entries H[i][j] = d2 phi / dxi dxj
        H = np.empty((3, 3) + np.shape(phi))
        H[0, 0] = -2 * py * pz
        H[1, 1] = -2 * px * pz
        H[2, 2] = -2 * px * py
        H[0, 1] = H[1, 0] = 4 * x * y * pz
        H[0, 2] = H[2, 0] = 4 * x * z * py
        H[1, 2] = H[2, 1] = 4 * y * z * px
        return phi, d1, lap, H

    def u_exact(x, y, z):
        phi = (9.0 - x * x) * (9.0 - y * y) * (9.0 - z * z)
        return np.stack([a[c] * phi for c in range(3)])

    def f(x, y, z):
        phi, d1, lap, H = parts(np.asarray(x, np.float64),
                                np.asarray(y, np.float64),
                                np.asarray(z, np.float64))
        # div u = sum_c a_c d_c phi;  grad(div u)_i = sum_c a_c H[i, c]
        gdiv = np.einsum("c,ic...->i...", a, H)
        a_b = a.reshape((3,) + (1,) * np.ndim(lap))
        return -(lam + mu) * gdiv - mu * a_b * lap[None]

    return u_exact, f


def solve_elasticity_box(domain, n_cells: int, *, lam: float = 1.0,
                         mu: float = 1.0, body_force: Callable = None,
                         dtype=jnp.float32, tol: float = 1e-6,
                         maxiter: int = 2000, precond: str = "jacobi",
                         matvec_impl: Optional[Callable] = None
                         ) -> ElasticityBoxSolution:
    """Clamped 3D elasticity on (domain)^3 with n_cells^3 cells.

    body_force: f(x, y, z) -> [3, ...] (numpy, evaluated on the node grid).
    Assembly + preconditioner setup are analytic (host, sub-second at any
    size); the solve runs PCG on the block-stencil SpMV with
    ``precond="jacobi"`` (3x3 block-Jacobi) or ``"mg"`` (vector geometric
    multigrid, componentwise P1 transfers + block-Jacobi smoothing).
    """
    info, coords_grid, bc_grid = _light_grid(domain, n_cells, 3)
    plan = structured_plan(info, embed=True)
    offsets = plan.offsets
    ng = info.node_grid
    nn = int(np.prod(ng))

    Ke1, Me1 = uniform_cell_matrices(domain, n_cells, lam, mu)
    data_np = elasticity_stencil_data(plan, Ke1, np.dtype(dtype).type)
    mask_np = _embed_grid_numpy(bc_grid, plan.store_grid, fill=False)
    data_np = _apply_bc_blocks(data_np, offsets, mask_np)

    # consistent RHS: scalar mass stencil applied to nodal f components
    mass_np = _uniform_stencil_data(plan, Me1, np.dtype(dtype).type)
    if body_force is None:
        f_nodes = np.zeros((3,) + tuple(ng))
    else:
        f_nodes = np.asarray(body_force(coords_grid[0], coords_grid[1],
                                        coords_grid[2]))
    b_np = np.stack([
        _embed_grid_numpy(f_nodes[c].reshape(ng), plan.store_grid)
        for c in range(3)]).astype(np.dtype(dtype).type)

    # block-Jacobi: invert the 3x3 diagonal blocks once (host)
    diag_k = offsets.index(0)
    D = np.moveaxis(data_np[diag_k], -1, 0)              # [NS, 3, 3]
    Dinv = np.linalg.inv(D + np.where(
        np.abs(np.linalg.det(D)) < 1e-30, 1.0, 0.0)[:, None, None]
        * np.eye(3))
    Dinv = np.moveaxis(Dinv, 0, -1).astype(np.dtype(dtype).type)

    data = jax.device_put(jnp.asarray(data_np))
    mass = jax.device_put(jnp.asarray(mass_np))
    Minv = jax.device_put(jnp.asarray(Dinv))
    b_f = jax.device_put(jnp.asarray(b_np))
    mask = jax.device_put(jnp.asarray(mask_np))

    mv = matvec_impl or (lambda d, x: block_stencil_matvec(d, x, offsets))

    mg_levels = None
    if precond == "mg":
        mg_levels = build_elasticity_multigrid(domain, n_cells, lam=lam,
                                               mu=mu, dtype=dtype)

    @jax.jit
    def solve(data, mass, Minv, b_f, mask, lv):
        from tpufem.sparse.stencil import stencil_matvec
        b = jnp.stack([stencil_matvec(mass, offsets, b_f[c])
                       for c in range(3)])
        b = jnp.where(mask[None, :], 0.0, b)

        def matvec(x):
            return mv(data, x)

        if lv is not None:
            M = elastic_mg_preconditioner(lv, nu1=1, nu2=1)
        else:
            M = lambda r: (Minv * r[None, :, :]).sum(axis=1)

        return cg(matvec, b, tol=tol, maxiter=maxiter, M=M)

    res = solve(data, mass, Minv, b_f, mask, mg_levels)
    u = np.stack([np.asarray(plan.extract_field(res.x[c]))
                  for c in range(3)])
    return ElasticityBoxSolution(u=u, cg=res, num_dofs=3 * nn,
                                 node_grid=tuple(ng))