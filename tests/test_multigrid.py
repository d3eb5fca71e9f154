"""Geometric multigrid: transfer-operator exactness, V-cycle convergence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpufem.assemble.planar import (element_coords_bt, element_load_bt,
                                    p1_stiffness_bt)
from tpufem.assemble.structured import (assemble_vector_structured_bt,
                                        structured_plan)
from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.fem.quadrature import tetrahedron_rule, triangle_rule
from tpufem.solve.cg import cg
from tpufem.solve.multigrid import (build_poisson_multigrid,
                                    mg_preconditioner, prolong, restrict,
                                    v_cycle)
from tpufem.solve.poisson import (model_problem_2d, model_problem_2d_planes,
                                  model_problem_3d, model_problem_3d_planes)
from tpufem.sparse.stencil import stencil_matvec


@pytest.mark.parametrize("dim", [2, 3])
def test_restrict_is_prolong_adjoint(dim):
    rng = np.random.default_rng(0)
    nc = 5
    shape_c = (nc,) * dim
    shape_f = (2 * nc - 1,) * dim
    xc = jnp.asarray(rng.standard_normal(shape_c))
    yf = jnp.asarray(rng.standard_normal(shape_f))
    lhs = jnp.vdot(prolong(xc, dim), yf)
    rhs = jnp.vdot(xc, restrict(yf, dim))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-13)


def test_prolong_exact_on_linear_functions():
    """P1 interpolation must reproduce linears exactly (nested spaces)."""
    for dim in (2, 3):
        n = 4
        axes = [np.linspace(0, 1, n + 1)] * dim
        grids = np.meshgrid(*axes, indexing="ij")
        lin = sum((i + 1) * g for i, g in enumerate(grids)) + 0.5
        fine = prolong(jnp.asarray(lin), dim)
        axes_f = [np.linspace(0, 1, 2 * n + 1)] * dim
        grids_f = np.meshgrid(*axes_f, indexing="ij")
        lin_f = sum((i + 1) * g for i, g in enumerate(grids_f)) + 0.5
        np.testing.assert_allclose(np.asarray(fine), lin_f, rtol=1e-13)


def test_galerkin_property_2d():
    """Rediscretized coarse operator == P^T A_f P (exact nesting)."""
    levels = build_poisson_multigrid((-3.0, 3.0), 8, 2, dtype=jnp.float64,
                                     coarse_max=4, use_pallas=False)
    fine, coarse = levels[0], levels[1]
    nc = coarse.plan.info.node_grid
    nn_c = int(np.prod(nc))
    Ac_redisc = np.zeros((nn_c, nn_c))
    Ac_galerkin = np.zeros((nn_c, nn_c))
    for j in range(nn_c):
        ej = jnp.zeros(nn_c).at[j].set(1.0)
        # rediscretized action
        ejs = coarse.plan.embed_field(ej)
        Ac_redisc[:, j] = np.asarray(coarse.plan.extract_field(
            stencil_matvec(coarse.data, coarse.plan.offsets, ejs)))
        # Galerkin action: P^T A_f P e_j
        pf = prolong(ej.reshape(nc), 2)
        pfs = fine.plan.embed_field(pf.reshape(-1))
        af = stencil_matvec(fine.data, fine.plan.offsets, pfs)
        af_grid = fine.plan.extract_field(af).reshape(
            fine.plan.info.node_grid)
        Ac_galerkin[:, j] = np.asarray(restrict(af_grid, 2)).reshape(-1)
    # compare on interior rows/cols (BC rows differ: identity vs Galerkin)
    flags = np.asarray(coarse.bc_mask)
    interior = np.asarray(coarse.plan.extract_field(
        jnp.asarray(~np.asarray(coarse.bc_mask)))).astype(bool)
    ii = np.nonzero(interior)[0]
    np.testing.assert_allclose(Ac_redisc[np.ix_(ii, ii)],
                               Ac_galerkin[np.ix_(ii, ii)],
                               rtol=1e-11, atol=1e-12)


@pytest.mark.parametrize("dim,n", [(2, 32), (3, 16)])
def test_mg_pcg_convergence(dim, n):
    """MG-PCG must converge in O(10) iterations, mesh-independently."""
    levels = build_poisson_multigrid((-3.0, 3.0), n, dim,
                                     dtype=jnp.float64, coarse_max=4,
                                     use_pallas=False)
    top = levels[0]
    if dim == 2:
        mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
        rule = triangle_rule(5)
        fp = model_problem_2d_planes()
        exact = model_problem_2d()[1]
    else:
        mesh = box_mesh(-3, 3, -3, 3, -3, 3, n, n, n)
        rule = tetrahedron_rule(3)
        fp = model_problem_3d_planes()
        exact = model_problem_3d()[1]
    X = jnp.asarray(element_coords_bt(mesh, np.float64))
    be = element_load_bt(X, mesh.cell_type, rule, fp)
    b = assemble_vector_structured_bt(top.plan, be)
    b = jnp.where(top.bc_mask, 0, b)

    M = mg_preconditioner(levels, use_pallas=False)
    mv = lambda v: stencil_matvec(top.data, top.plan.offsets, v)
    res = cg(mv, b, tol=1e-10, maxiter=60, M=M)
    assert bool(res.converged), f"relres {float(res.residual_norm)}"
    assert int(res.iterations) <= 14, f"{int(res.iterations)} iters"

    # plain Jacobi-PCG needs many more iterations on the same system
    d = jnp.where(top.inv_diag != 0, top.inv_diag, 1.0)
    res_j = cg(mv, b, tol=1e-10, maxiter=2000, M=lambda r: r * d)
    assert int(res_j.iterations) > 3 * int(res.iterations)

    # and the answer is right
    u = np.asarray(top.plan.extract_field(res.x))
    ue = exact(mesh.coords)
    rel = np.sqrt(np.mean((u - ue) ** 2)) / np.sqrt(np.mean(ue ** 2))
    assert rel < (0.01 if dim == 2 else 0.05)


def test_vcycle_reduces_error():
    levels = build_poisson_multigrid((-3.0, 3.0), 16, 2, dtype=jnp.float64,
                                     coarse_max=4, use_pallas=False)
    top = levels[0]
    rng = np.random.default_rng(1)
    x_true = jnp.asarray(rng.standard_normal(top.plan.num_store_rows))
    x_true = jnp.where(top.bc_mask, 0, x_true)
    # zero the embedded border/padding
    x_true = top.plan.embed_field(top.plan.extract_field(x_true))
    mv = lambda v: stencil_matvec(top.data, top.plan.offsets, v)
    b = mv(x_true)
    e = v_cycle(levels, b, use_pallas=False)   # one cycle from x0 = 0
    err0 = float(jnp.linalg.norm(x_true))
    err1 = float(jnp.linalg.norm(x_true - e))
    assert err1 < 0.2 * err0, (err0, err1)


# -- round-2 additions: fused dots + mixed-precision preconditioner ----------

def _small_hierarchy(n=16, dim=3):
    from tpufem.solve.multigrid import build_poisson_multigrid
    levels = build_poisson_multigrid((-3.0, 3.0), n, dim,
                                     dtype=jnp.float32, use_pallas=False)
    L = levels[0]
    rng = np.random.default_rng(7)
    ns = L.plan.num_store_rows
    diag = np.asarray(L.data[L.plan.offsets.index(0)])
    xt = jnp.asarray(np.where(diag != 0, rng.standard_normal(ns), 0.0),
                     jnp.float32)
    r = jnp.asarray(np.where(diag != 0, rng.standard_normal(ns), 0.0),
                    jnp.float32)
    return levels, L, xt, r


def test_fused_dot_kernels_match_unfused():
    """interpret-mode exactness: matvec_dot / smooth_dot vs separate ops."""
    from tpufem.ops.stencil_pallas import (
        stencil_matvec_dot_embedded, stencil_matvec_embedded,
        stencil_smooth_dot_embedded, stencil_smooth_embedded)
    _, L, x, r = _small_hierarchy()
    y0 = stencil_matvec_embedded(L.data, x, L.plan, interpret=True)
    y1, d1 = stencil_matvec_dot_embedded(L.data, x, L.plan, interpret=True)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    np.testing.assert_allclose(float(d1), float(jnp.vdot(x, y0)), rtol=1e-5)

    s0 = stencil_smooth_embedded(L.data, r, x, L.inv_diag, L.plan,
                                 interpret=True)
    s1, rz = stencil_smooth_dot_embedded(L.data, r, x, L.inv_diag, L.plan,
                                         interpret=True)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_allclose(float(rz), float(jnp.vdot(r, s0)), rtol=1e-5)


def test_vcycle_final_dot_matches():
    levels, _, _, r = _small_hierarchy()
    e0 = v_cycle(levels, r, nu1=1, nu2=1, use_pallas=False)
    e1, rz = v_cycle(levels, r, nu1=1, nu2=1, use_pallas=False,
                     final_dot=True)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    np.testing.assert_allclose(float(rz), float(jnp.vdot(r, e0)), rtol=1e-6)


def test_bf16_hierarchy_preconditioner_convergence():
    """cast_hierarchy(bfloat16) must not cost MG-PCG iterations (the
    rounded level operators stay symmetric -> still a fixed SPD M)."""
    from tpufem.solve.multigrid import cast_hierarchy
    levels, L, xt, _ = _small_hierarchy(n=16)
    mv = lambda v: stencil_matvec(L.data, L.plan.offsets, v)
    b = mv(xt)
    res32 = cg(mv, b, tol=1e-6, maxiter=60,
               M=mg_preconditioner(levels, nu1=1, nu2=1, use_pallas=False))
    lev16 = cast_hierarchy(levels, jnp.bfloat16)
    res16 = cg(mv, b, tol=1e-6, maxiter=60,
               M=mg_preconditioner(lev16, nu1=1, nu2=1, use_pallas=False))
    assert bool(res16.converged)
    assert int(res16.iterations) <= int(res32.iterations) + 2


def test_cg_fused_hooks_equivalent():
    """cg/cg_fixed with matvec_dot/M_dot == the plain formulation."""
    from tpufem.solve.cg import cg_fixed
    levels, L, xt, _ = _small_hierarchy(n=16)
    mv = lambda v: stencil_matvec(L.data, L.plan.offsets, v)
    b = mv(xt)
    M = mg_preconditioner(levels, nu1=1, nu2=1, use_pallas=False)
    Md = mg_preconditioner(levels, nu1=1, nu2=1, use_pallas=False,
                           with_dot=True)
    mvd = lambda p: (mv(p), jnp.vdot(p, mv(p)))
    res0 = cg(mv, b, tol=1e-6, maxiter=60, M=M)
    res1 = cg(mv, b, tol=1e-6, maxiter=60, matvec_dot=mvd, M_dot=Md)
    assert int(res0.iterations) == int(res1.iterations)
    np.testing.assert_array_equal(np.asarray(res0.x), np.asarray(res1.x))
    x0, _ = cg_fixed(mv, b, 8, M=M)
    x1, _ = cg_fixed(mv, b, 8, matvec_dot=mvd, M_dot=Md)
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x1))


# -- round-2: constant-coefficient (uniform-box) hierarchy -------------------

@pytest.mark.parametrize("dim,n", [(2, 16), (3, 8)])
def test_const_hierarchy_matches_general_operator(dim, n):
    """ConstMGLevel matvec == the general analytic level operator, per level."""
    from tpufem.solve.multigrid import _matvec
    gen = build_poisson_multigrid((-3.0, 3.0), n, dim, dtype=jnp.float64,
                                  coarse_max=4, use_pallas=False)
    con = build_poisson_multigrid((-3.0, 3.0), n, dim, dtype=jnp.float64,
                                  coarse_max=4, use_pallas=False,
                                  operator="const")
    assert len(gen) == len(con)
    rng = np.random.default_rng(3)
    for lg, lc in zip(gen, con):
        x = jnp.asarray(rng.standard_normal(lg.plan.num_store_rows))
        y_gen = _matvec(lg, x, False)
        y_con = _matvec(lc, x, False)
        np.testing.assert_allclose(np.asarray(y_con), np.asarray(y_gen),
                                   rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(np.asarray(lc.inv_diag),
                                   np.asarray(lg.inv_diag),
                                   rtol=1e-12, atol=1e-12)
    # coarse inverse exists on both and matches
    np.testing.assert_allclose(np.asarray(con[-1].coarse_inverse),
                               np.asarray(gen[-1].coarse_inverse),
                               rtol=1e-10, atol=1e-12)


def test_const_pallas_kernels_match_xla():
    """interpret-mode const kernels == the XLA const formulation."""
    from tpufem.ops.stencil_pallas import (
        const_matvec_embedded, const_residual_embedded,
        const_smooth_dot_embedded, const_smooth_embedded)
    from tpufem.solve.multigrid import _matvec, _residual, _smooth
    con = build_poisson_multigrid((-3.0, 3.0), 8, 3, dtype=jnp.float32,
                                  coarse_max=4, use_pallas=False,
                                  operator="const")
    L = con[0]
    rng = np.random.default_rng(5)
    ns = L.plan.num_store_rows
    x = jnp.asarray(rng.standard_normal(ns), jnp.float32)
    r = jnp.asarray(rng.standard_normal(ns), jnp.float32)

    y0 = _matvec(L, x, False)
    y1 = const_matvec_embedded(L.weights, L.code, x, L.plan, interpret=True)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-6, atol=1e-5)

    r0 = _residual(L, r, x, False)
    r1 = const_residual_embedded(L.weights, L.code, r, x, L.plan,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0),
                               rtol=1e-6, atol=1e-5)

    s0 = _smooth(L, r, x, 0.8, False)
    s1 = const_smooth_embedded(L.weights, L.code, r, x, L.plan, omega=0.8,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                               rtol=1e-6, atol=1e-5)

    s2, rz = const_smooth_dot_embedded(L.weights, L.code, r, x, L.plan,
                                       omega=0.8, interpret=True)
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(s1))
    np.testing.assert_allclose(float(rz), float(jnp.vdot(r, s1)), rtol=1e-4)


def test_const_preconditioner_convergence_matches_general():
    """MG-PCG with the const-hierarchy preconditioner must converge like the
    general hierarchy (same operator, same V-cycle) on the general system."""
    gen = build_poisson_multigrid((-3.0, 3.0), 16, 3, dtype=jnp.float64,
                                  coarse_max=4, use_pallas=False)
    con = build_poisson_multigrid((-3.0, 3.0), 16, 3, dtype=jnp.float64,
                                  coarse_max=4, use_pallas=False,
                                  operator="const")
    top = gen[0]
    rng = np.random.default_rng(11)
    xt = jnp.asarray(rng.standard_normal(top.plan.num_store_rows))
    xt = jnp.where(top.bc_mask, 0, xt)
    xt = top.plan.embed_field(top.plan.extract_field(xt))
    mv = lambda v: stencil_matvec(top.data, top.plan.offsets, v)
    b = mv(xt)
    res_g = cg(mv, b, tol=1e-10, maxiter=60,
               M=mg_preconditioner(gen, use_pallas=False))
    res_c = cg(mv, b, tol=1e-10, maxiter=60,
               M=mg_preconditioner(con, use_pallas=False))
    assert bool(res_c.converged)
    assert int(res_c.iterations) == int(res_g.iterations)
    np.testing.assert_allclose(np.asarray(res_c.x), np.asarray(res_g.x),
                               rtol=1e-8, atol=1e-9)


def test_const_vcycle_final_dot():
    con = build_poisson_multigrid((-3.0, 3.0), 8, 3, dtype=jnp.float64,
                                  coarse_max=4, use_pallas=False,
                                  operator="const")
    rng = np.random.default_rng(13)
    r = jnp.asarray(rng.standard_normal(con[0].plan.num_store_rows))
    r = jnp.where(con[0].bc_mask, 0, r)
    r = con[0].plan.embed_field(con[0].plan.extract_field(r))
    e0 = v_cycle(con, r, nu1=1, nu2=1, use_pallas=False)
    e1, rz = v_cycle(con, r, nu1=1, nu2=1, use_pallas=False, final_dot=True)
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    np.testing.assert_allclose(float(rz), float(jnp.vdot(r, e0)), rtol=1e-8)


def test_cast_hierarchy_handles_const_levels():
    from tpufem.solve.multigrid import ConstMGLevel, cast_hierarchy
    con = build_poisson_multigrid((-3.0, 3.0), 8, 2, dtype=jnp.float32,
                                  coarse_max=4, use_pallas=False,
                                  operator="const")
    c16 = cast_hierarchy(con, jnp.bfloat16)
    assert all(isinstance(l, ConstMGLevel) for l in c16)
    assert c16[0].code.dtype == jnp.bfloat16
    assert c16[0].weights == con[0].weights
