"""Analytic block-stencil elasticity (VERDICT item 7).

The structured path must match the generic BCSR pipeline operator exactly
and converge at O(h^2) against the manufactured vector solution.
"""
import numpy as np

import jax
import jax.numpy as jnp

from tpufem.fem.space import VectorFunctionSpace
from tpufem.mesh.box import box_mesh
from tpufem.solve.elasticity import elasticity_forms
from tpufem.solve.elasticity_structured import (
    block_stencil_matvec, elasticity_stencil_data,
    manufactured_elasticity_3d, solve_elasticity_box, uniform_cell_matrices,
    _apply_bc_blocks)
from tpufem.solve.multigrid import _embed_grid_numpy, _light_grid
from tpufem.assemble.structured import structured_plan
from tpufem.mesh.adjacency import ell_pattern
from tpufem.sparse.bcsr import apply_dirichlet_bcsr, assemble_bcsr

LAM, MU = 1.2, 0.8


def test_block_stencil_matches_bcsr_operator():
    """Analytic block-stencil matvec == generic BCSR matvec (1e-12)."""
    n = 4
    mesh = box_mesh(-3, 3, -3, 3, -3, 3, n, n, n)
    V = VectorFunctionSpace(mesh, degree=1)
    wf = elasticity_forms(V, LAM, MU)
    wf.dtype = jnp.float64
    Ke = wf.element_matrices(jnp.asarray(mesh.element_coords(), jnp.float64))
    pattern = ell_pattern(V.scalar_dof_conn, V.num_scalar_dofs, pad_to=16)
    A = assemble_bcsr(pattern, Ke, block_size=3)
    mask = jnp.asarray(V.dof_flags)
    A, _ = apply_dirichlet_bcsr(A, jnp.zeros(V.num_dofs, jnp.float64), mask)

    info, _, bc_grid = _light_grid((-3.0, 3.0), n, 3)
    plan = structured_plan(info, embed=True)
    Ke1, _ = uniform_cell_matrices((-3.0, 3.0), n, LAM, MU)
    data = elasticity_stencil_data(plan, Ke1, np.float64)
    mask_np = _embed_grid_numpy(bc_grid, plan.store_grid, fill=False)
    data = _apply_bc_blocks(data, plan.offsets, mask_np)

    rng = np.random.default_rng(0)
    x_nodes = rng.standard_normal((mesh.num_nodes, 3))
    # generic path: node-major comp-minor flat vector
    y_ref = np.asarray(A.matvec(jnp.asarray(x_nodes.reshape(-1))))
    y_ref = y_ref.reshape(-1, 3)

    x_emb = jnp.stack([plan.embed_field(jnp.asarray(x_nodes[:, c]))
                       for c in range(3)])
    y_emb = block_stencil_matvec(jnp.asarray(data), x_emb, plan.offsets)
    y = np.stack([np.asarray(plan.extract_field(y_emb[c]))
                  for c in range(3)], axis=1)
    err = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    assert err < 1e-12, err


def test_elasticity_box_convergence():
    """Manufactured vector solution: rel L2 error shrinks ~O(h^2)."""
    u_exact, f = manufactured_elasticity_3d(LAM, MU)
    errs = []
    for n in (6, 12):
        sol = solve_elasticity_box((-3.0, 3.0), n, lam=LAM, mu=MU,
                                   body_force=f, dtype=jnp.float64,
                                   tol=1e-10, maxiter=4000)
        assert bool(sol.cg.converged)
        info, coords_grid, _ = _light_grid((-3.0, 3.0), n, 3)
        ue = u_exact(coords_grid[0], coords_grid[1], coords_grid[2])
        ue = ue.reshape(3, -1)
        err = (np.linalg.norm(sol.u - ue) / np.linalg.norm(ue))
        errs.append(err)
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.7, (errs, rate)


def test_elasticity_vector_multigrid():
    """Vector MG-PCG: same solution as block-Jacobi, far fewer iterations,
    roughly mesh-independent count."""
    u_exact, f = manufactured_elasticity_3d(LAM, MU)
    iters = {}
    for n in (16, 32):
        sol_j = solve_elasticity_box((-3.0, 3.0), n, lam=LAM, mu=MU,
                                     body_force=f, dtype=jnp.float64,
                                     tol=1e-8, maxiter=4000,
                                     precond="jacobi")
        sol_m = solve_elasticity_box((-3.0, 3.0), n, lam=LAM, mu=MU,
                                     body_force=f, dtype=jnp.float64,
                                     tol=1e-8, maxiter=200, precond="mg")
        assert bool(sol_m.cg.converged)
        du = (np.linalg.norm(sol_m.u - sol_j.u)
              / np.linalg.norm(sol_j.u))
        assert du < 1e-6, du
        iters[n] = (int(sol_j.cg.iterations), int(sol_m.cg.iterations))
        assert iters[n][1] < iters[n][0] / 3
    # mesh-independence: iteration growth from n=16 to n=32 stays small
    assert iters[32][1] <= iters[16][1] + 6, iters


def test_elasticity_box_zero_force_is_zero():
    sol = solve_elasticity_box((-3.0, 3.0), 4, lam=LAM, mu=MU,
                               body_force=None, dtype=jnp.float64,
                               tol=1e-12, maxiter=100)
    assert np.abs(sol.u).max() < 1e-12


def test_solve_elasticity_pallas_matvec():
    """Unstructured BCSR path through the banded block kernel matches the
    gather path (interpret mode)."""
    from tpufem.mesh.rectangle import perturbed_rectangle_mesh
    from tpufem.solve.elasticity import solve_elasticity

    mesh = perturbed_rectangle_mesh(0, 1, 0, 1, 10, 10, jitter=0.2, seed=2)

    def bf(x):
        return np.stack([0.0 * x[..., 0] + 1.0, -0.5 + 0.0 * x[..., 0]],
                        axis=-1)

    ref = solve_elasticity(mesh, lam=1.2, mu=0.8, body_force=bf,
                           dtype=jnp.float64, tol=1e-10, maxiter=4000)
    sol = solve_elasticity(mesh, lam=1.2, mu=0.8, body_force=bf,
                           dtype=jnp.float64, tol=1e-10, maxiter=4000,
                           matvec="pallas", block_rows=128, interpret=True)
    assert bool(sol.cg.converged)
    du = (np.linalg.norm(np.asarray(sol.u) - np.asarray(ref.u))
          / np.linalg.norm(np.asarray(ref.u)))
    assert du < 1e-8, du
