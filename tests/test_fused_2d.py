"""2D fused system build + general Dirichlet data (VERDICT item 9)."""
import numpy as np

import jax
import jax.numpy as jnp

from tpufem.assemble.planar import (element_coord_views, element_load_views,
                                    p1_stiffness_views)
from tpufem.assemble.structured import (assemble_stencil_structured_bt,
                                        assemble_vector_structured_bt,
                                        structured_plan)
from tpufem.fem.quadrature import triangle_rule
from tpufem.ops.fused_system_pallas import (build_poisson_system_pallas,
                                            node_coords_embedded_from_grid)
from tpufem.solve.bc import apply_dirichlet_stencil
from tpufem.solve.multigrid import _light_grid
from tpufem.solve.poisson import model_problem_2d
from tpufem.solve.structured_fast import solve_poisson_fast

F2 = lambda x, y: 36.0 - 2.0 * (x * x + y * y)


def _xla_system(n, dtype=np.float64, g_emb=None):
    info, coords_grid, bc_grid = _light_grid((-3.0, 3.0), n, 2)
    plan = structured_plan(info, embed=True)
    bc = plan.embed_field(jnp.asarray(bc_grid.reshape(-1)), fill=False)
    Xv = element_coord_views(coords_grid.astype(dtype), info)
    A = assemble_stencil_structured_bt(plan,
                                       p1_stiffness_views(Xv, "triangle"))
    b = assemble_vector_structured_bt(
        plan, element_load_views(Xv, "triangle", triangle_rule(2), F2))
    A, b = apply_dirichlet_stencil(A, b, bc, g_emb)
    return plan, coords_grid, bc, A, b


def test_fused_2d_matches_xla_path():
    n = 12
    plan, coords_grid, bc, A_ref, b_ref = _xla_system(n)
    C = jnp.asarray(node_coords_embedded_from_grid(coords_grid, plan,
                                                   np.float64))
    A, b = build_poisson_system_pallas(plan, C, bc, F2, triangle_rule(2),
                                       rhs_mode="quadrature", interpret=True)
    scale = float(jnp.abs(A_ref.data).max())
    assert float(jnp.abs(A.data - A_ref.data).max()) / scale < 1e-12
    bscale = max(float(jnp.abs(b_ref).max()), 1e-30)
    assert float(jnp.abs(b - b_ref).max()) / bscale < 1e-12


def test_fused_2d_raw_plus_bc_matches():
    """apply_bc=False + vectorized elimination == in-kernel BC."""
    n = 8
    plan, coords_grid, bc, A_ref, b_ref = _xla_system(n)
    C = jnp.asarray(node_coords_embedded_from_grid(coords_grid, plan,
                                                   np.float64))
    A0, b0 = build_poisson_system_pallas(plan, C, bc, F2, triangle_rule(2),
                                         apply_bc=False,
                                         rhs_mode="quadrature",
                                         interpret=True)
    A1, b1 = apply_dirichlet_stencil(A0, b0, bc)
    assert float(jnp.abs(A1.data - A_ref.data).max()) < 1e-12
    assert float(jnp.abs(b1 - b_ref).max()) < 1e-12


def test_solve_poisson_fast_2d():
    """2D flagship path through the fused kernel, vs exact solution."""
    f, exact = model_problem_2d()
    sol = solve_poisson_fast((-3.0, 3.0), 32, F2, dim=2, tol=1e-7,
                             maxiter=60, dtype=jnp.float64, interpret=True)
    assert bool(sol.cg.converged)
    info, coords_grid, _ = _light_grid((-3.0, 3.0), 32, 2)
    coords = coords_grid.reshape(2, -1).T
    ue = exact(coords)
    err = (np.sqrt(np.mean((np.asarray(sol.u) - ue) ** 2))
           / np.sqrt(np.mean(ue ** 2)))
    assert err < 2e-3, err


def test_solve_poisson_fast_nonzero_g_2d():
    """Linear manufactured solution with nonzero boundary data is exact."""
    g = lambda x, y: 1.0 + 2.0 * x - 3.0 * y
    sol = solve_poisson_fast((-3.0, 3.0), 16, lambda x, y: 0.0 * x, dim=2,
                             tol=1e-11, maxiter=200, dtype=jnp.float64,
                             g=g, interpret=True)
    assert bool(sol.cg.converged)
    info, coords_grid, _ = _light_grid((-3.0, 3.0), 16, 2)
    ue = g(coords_grid[0], coords_grid[1]).reshape(-1)
    err = np.abs(np.asarray(sol.u) - ue).max()
    assert err < 1e-8, err


def test_solve_poisson_fast_nonzero_g_3d():
    """Same for the 3D fused path: raw build + general elimination."""
    g = lambda x, y, z: 0.5 * x - y + 2.0 * z
    sol = solve_poisson_fast((-3.0, 3.0), 8, lambda x, y, z: 0.0 * x,
                             dim=3, tol=1e-11, maxiter=300,
                             dtype=jnp.float64, g=g, interpret=True)
    assert bool(sol.cg.converged)
    info, coords_grid, _ = _light_grid((-3.0, 3.0), 8, 3)
    ue = g(coords_grid[0], coords_grid[1], coords_grid[2]).reshape(-1)
    err = np.abs(np.asarray(sol.u) - ue).max()
    assert err < 1e-8, err


def test_fused_interp_rhs_exact_for_linear_f():
    """rhs_mode='interp' integrates P1-interpolated f exactly: for linear f
    it matches the quadrature path to roundoff."""
    n = 10
    plan, coords_grid, bc, _, _ = _xla_system(n)
    C = jnp.asarray(node_coords_embedded_from_grid(coords_grid, plan,
                                                   np.float64))
    flin = lambda x, y: 2.0 * x - y + 0.5
    _, b_q = build_poisson_system_pallas(plan, C, bc, flin,
                                         triangle_rule(2),
                                         rhs_mode="quadrature",
                                         interpret=True)
    _, b_i = build_poisson_system_pallas(plan, C, bc, flin,
                                         triangle_rule(2),
                                         rhs_mode="interp", interpret=True)
    assert float(jnp.abs(b_q - b_i).max()) < 1e-12


def test_fused_interp_rhs_solution_accuracy():
    """interp RHS keeps O(h^2) solution accuracy on the model problem."""
    from tpufem.solve.poisson import model_problem_2d

    _, exact = model_problem_2d()
    errs = []
    for n in (16, 32):
        sol = solve_poisson_fast((-3.0, 3.0), n, F2, dim=2, tol=1e-9,
                                 maxiter=80, dtype=jnp.float64,
                                 interpret=True)
        info, coords_grid, _ = _light_grid((-3.0, 3.0), n, 2)
        ue = exact(coords_grid.reshape(2, -1).T)
        errs.append(float(np.sqrt(np.mean((np.asarray(sol.u) - ue) ** 2))
                          / np.sqrt(np.mean(ue ** 2))))
    rate = np.log2(errs[0] / errs[1])
    assert rate > 1.8, (errs, rate)


def test_solve_poisson_fast_const_precond_3d():
    """The default const-hierarchy preconditioner matches the general one
    (same solution, comparable iterations), including with nonzero g."""
    from tpufem.solve.poisson import model_problem_3d_planes
    import jax.numpy as jnp
    F3 = model_problem_3d_planes()
    kw = dict(dim=3, tol=1e-7, quadrature_degree=2, interpret=True,
              dtype=jnp.float32)
    s_const = solve_poisson_fast((-3.0, 3.0), 8, F3, precond="const", **kw)
    s_gen = solve_poisson_fast((-3.0, 3.0), 8, F3, precond="general", **kw)
    assert bool(s_const.cg.converged) and bool(s_gen.cg.converged)
    assert abs(int(s_const.cg.iterations) - int(s_gen.cg.iterations)) <= 4
    np.testing.assert_allclose(np.asarray(s_const.u), np.asarray(s_gen.u),
                               rtol=1e-5, atol=1e-6)

    # nonzero Dirichlet data: exact solution u = x + 2y - z (harmonic)
    gfun = lambda x, y, z: x + 2.0 * y - z
    s_g = solve_poisson_fast((-3.0, 3.0), 8, lambda x, y, z: 0.0 * x,
                             g=gfun, precond="const", **kw)
    assert bool(s_g.cg.converged)
    from tpufem.solve.multigrid import _light_grid
    _, cg3, _ = _light_grid((-3.0, 3.0), 8, 3)
    ue = (cg3[0] + 2.0 * cg3[1] - cg3[2]).reshape(-1)
    err = np.linalg.norm(np.asarray(s_g.u) - ue) / np.linalg.norm(ue)
    assert err < 1e-5, err
