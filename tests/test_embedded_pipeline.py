"""The embedded production pipeline end-to-end on CPU (+ 8-device dist)."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpufem.assemble.planar import (element_coords_bt, element_load_bt,
                                    p1_stiffness_bt)
from tpufem.assemble.structured import (assemble_stencil_structured_bt,
                                        assemble_vector_structured_bt,
                                        structured_plan)
from tpufem.fem.quadrature import tetrahedron_rule, triangle_rule
from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.ops.stencil_pallas import stencil_matvec_embedded
from tpufem.solve.bc import apply_dirichlet_stencil
from tpufem.solve.cg import cg
from tpufem.solve.poisson import (model_problem_2d, model_problem_2d_planes,
                                  model_problem_3d, model_problem_3d_planes,
                                  solve_poisson_ell)
from tpufem.sparse.stencil import stencil_matvec


def _embedded_system(mesh, cell, rule, f_planes):
    plan = structured_plan(mesh, embed=True)
    X = jnp.asarray(element_coords_bt(mesh, np.float64))
    Ke = p1_stiffness_bt(X, cell)
    A = assemble_stencil_structured_bt(plan, Ke)
    be = element_load_bt(X, cell, rule, f_planes)
    b = assemble_vector_structured_bt(plan, be)
    bc = plan.embed_field(jnp.asarray(mesh.node_flags != 0), fill=False)
    A, b = apply_dirichlet_stencil(A, b, bc)
    return plan, A, b


def test_embedded_2d_solve_matches_ell():
    mesh = rectangle_mesh(-3, 3, -3, 3, 16, 16)
    plan, A, b = _embedded_system(mesh, "triangle", triangle_rule(5),
                                  model_problem_2d_planes())
    res = cg(A.matvec, b, tol=1e-12, maxiter=3000)
    assert bool(res.converged)
    ref = solve_poisson_ell(mesh, tol=1e-12)
    np.testing.assert_allclose(
        np.asarray(plan.extract_field(res.x)), np.asarray(ref.u),
        rtol=1e-8, atol=1e-9)


def test_embedded_pallas_matvec_in_cg_3d():
    mesh = box_mesh(-3, 3, -3, 3, -3, 3, 8, 8, 8)
    plan, A, b = _embedded_system(mesh, "tetrahedron", tetrahedron_rule(3),
                                  model_problem_3d_planes())
    # pallas (interpret on CPU) inside the full CG loop
    mv = lambda v: stencil_matvec_embedded(A.data, v, plan, block_lead=2,
                                           interpret=True)
    res = cg(mv, b, tol=1e-10, maxiter=500)
    assert bool(res.converged)
    ref = cg(A.matvec, b, tol=1e-10, maxiter=500)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-10)


def test_embedded_distributed_cg(cpu_devices):
    """Embedded stencil system solved with the shard_map halo CG."""
    from tpufem.dist.cg import distributed_stencil_solve

    mesh = rectangle_mesh(-3, 3, -3, 3, 24, 24)
    plan, A, b = _embedded_system(mesh, "triangle", triangle_rule(5),
                                  model_problem_2d_planes())
    ref = cg(A.matvec, b, tol=1e-11, maxiter=3000)
    dmesh = Mesh(np.array(cpu_devices[:8]), ("rows",))
    x, res = distributed_stencil_solve(A, b, dmesh, tol=1e-11, maxiter=3000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref.x),
                               rtol=1e-8, atol=1e-9)


def test_embedded_mg_preconditioned_distributed_consistency(cpu_devices):
    """Auto-sharded (pjit) embedded MG-PCG == single-device MG-PCG."""
    from tpufem.solve.multigrid import (build_poisson_multigrid,
                                        mg_preconditioner)

    levels = build_poisson_multigrid((-3.0, 3.0), 16, 2, dtype=jnp.float64,
                                     coarse_max=4, use_pallas=False)
    top = levels[0]
    mesh = rectangle_mesh(-3, 3, -3, 3, 16, 16)
    X = jnp.asarray(element_coords_bt(mesh, np.float64))
    be = element_load_bt(X, "triangle", triangle_rule(5),
                         model_problem_2d_planes())
    b = assemble_vector_structured_bt(top.plan, be)
    b = jnp.where(top.bc_mask, 0, b)
    M = mg_preconditioner(levels, use_pallas=False)
    mv = lambda v: stencil_matvec(top.data, top.plan.offsets, v)
    ref = cg(mv, b, tol=1e-10, maxiter=60, M=M)
    assert bool(ref.converged)

    # auto-sharding: replicate operator, shard b; XLA inserts collectives
    dmesh = Mesh(np.array(cpu_devices[:8]), ("rows",))
    b_s = jax.device_put(b, NamedSharding(dmesh, P("rows")))
    res = jax.jit(lambda bb: cg(mv, bb, tol=1e-10, maxiter=60, M=M))(b_s)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(ref.x),
                               rtol=1e-9, atol=1e-10)


def test_fused_pallas_assembly_matches_xla():
    from tpufem.ops.assemble_pallas import (assemble_stencil_pallas,
                                            element_coords_bt_embedded)
    from tpufem.assemble.local import p1_stiffness
    from tpufem.assemble.structured import assemble_stencil_structured
    from tpufem.fem.elements import P1Tetrahedron

    mesh = box_mesh(-1, 2, 0, 1, -2, 0, 5, 4, 6)
    plan = structured_plan(mesh, embed=True)
    Ke = p1_stiffness(jnp.asarray(mesh.element_coords()), P1Tetrahedron())
    A_ref = assemble_stencil_structured(plan, Ke)
    X = jnp.asarray(element_coords_bt_embedded(mesh, plan, 2, np.float64))
    A = assemble_stencil_pallas(plan, X, block_lead=2, interpret=True)
    np.testing.assert_allclose(np.asarray(A.data), np.asarray(A_ref.data),
                               rtol=1e-12, atol=1e-13)


def test_fused_system_build_matches_xla():
    """Single-pass Pallas system build (stiffness+RHS+BC) vs XLA pipeline."""
    from tpufem.ops.fused_system_pallas import (build_poisson_system_pallas,
                                                node_coords_embedded)

    mesh = box_mesh(-3, 2, 0, 3, -2, 1, 5, 4, 6)
    plan = structured_plan(mesh, embed=True)
    rule = tetrahedron_rule(3)
    fp = model_problem_3d_planes()
    X = jnp.asarray(element_coords_bt(mesh, np.float64))
    A_ref = assemble_stencil_structured_bt(
        plan, p1_stiffness_bt(X, "tetrahedron"))
    b_ref = assemble_vector_structured_bt(
        plan, element_load_bt(X, "tetrahedron", rule, fp))
    bc = plan.embed_field(jnp.asarray(mesh.node_flags != 0), fill=False)
    A_ref, b_ref = apply_dirichlet_stencil(A_ref, b_ref, bc)

    C = jnp.asarray(node_coords_embedded(mesh, plan, np.float64))
    A, b = build_poisson_system_pallas(plan, C, bc, fp, rule,
                                       block_lead=2,
                                       rhs_mode="quadrature",
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(A.data), np.asarray(A_ref.data),
                               rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref),
                               rtol=1e-12, atol=1e-12)


def test_solve_poisson_fast_cpu():
    """The one-call fast path end-to-end (interpret mode on CPU)."""
    from tpufem.solve.structured_fast import solve_poisson_fast
    from tpufem.mesh.box import box_mesh as _bm

    sol = solve_poisson_fast((-3.0, 3.0), 8, model_problem_3d_planes(),
                             tol=1e-8, dtype=jnp.float64, interpret=True)
    assert bool(sol.cg.converged)
    mesh = _bm(-3, 3, -3, 3, -3, 3, 8, 8, 8)
    ue = model_problem_3d()[1](mesh.coords)
    u = np.asarray(sol.u)
    rel = np.sqrt(np.mean((u - ue) ** 2)) / np.sqrt(np.mean(ue ** 2))
    assert rel < 0.06    # O(h^2) at n=8 (interp RHS)


def test_fused_smoother_and_residual_kernels():
    from tpufem.ops.stencil_pallas import (stencil_residual_embedded,
                                           stencil_smooth_embedded)

    mesh = box_mesh(-3, 3, -3, 3, -3, 3, 6, 6, 6)
    plan, A, b = _embedded_system(mesh, "tetrahedron", tetrahedron_rule(3),
                                  model_problem_3d_planes())
    rng = np.random.default_rng(0)
    x = plan.embed_field(jnp.asarray(rng.standard_normal(mesh.num_nodes)))
    d = A.data[plan.offsets.index(0)]
    inv_d = jnp.where(d != 0, 1.0 / d, 1.0)

    r_ref = b - A.matvec(x)
    r_pal = stencil_residual_embedded(A.data, b, x, plan, block_lead=2,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(r_pal), np.asarray(r_ref),
                               rtol=1e-12, atol=1e-12)

    s_ref = x + 0.8 * inv_d * (b - A.matvec(x))
    s_pal = stencil_smooth_embedded(A.data, b, x, inv_d, plan, omega=0.8,
                                    block_lead=2, interpret=True)
    np.testing.assert_allclose(np.asarray(s_pal), np.asarray(s_ref),
                               rtol=1e-12, atol=1e-12)
