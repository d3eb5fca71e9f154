"""Dirichlet BC + CG solve: manufactured-solution correctness & convergence.

The reference never applies BCs or solves (SURVEY.md §0); its implied model
problem -Δu = 36 - 2(x²+y²) on (-3,3)², u|∂Ω = 0, exact u = (9-x²)(9-y²)
(/root/reference/fea_symbolic.cu:494-498) is the known-answer test here.
"""
import numpy as np
import jax.numpy as jnp

from tpufem.mesh.box import box_mesh
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.cg import cg
from tpufem.solve.poisson import (model_problem_2d, model_problem_3d,
                                  solve_poisson_dense, solve_poisson_ell)


def _l2_error(mesh, u, exact):
    ue = exact(mesh.coords)
    return np.sqrt(np.mean((np.asarray(u) - ue) ** 2))


def test_cg_against_numpy_solve():
    rng = np.random.default_rng(0)
    n = 40
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    b = rng.standard_normal(n)
    res = cg(lambda x: jnp.asarray(A) @ x, jnp.asarray(b), tol=1e-12,
             maxiter=500)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(A, b),
                               rtol=1e-8, atol=1e-10)


def test_cg_divergence_guard():
    # Indefinite matrix -> pAp <= 0 triggers the guard instead of looping.
    A = jnp.asarray(np.diag([1.0, -1.0, 2.0]))
    b = jnp.asarray(np.array([1.0, 1.0, 1.0]))
    res = cg(lambda x: A @ x, b, tol=1e-12, maxiter=100)
    assert bool(res.diverged)


def test_poisson_dense_matches_exact_2d():
    f, exact = model_problem_2d()
    mesh = rectangle_mesh(-3, 3, -3, 3, 16, 16)
    sol = solve_poisson_dense(mesh, f, tol=1e-12)
    assert bool(sol.cg.converged)
    err = _l2_error(mesh, sol.u, lambda c: exact(c))
    assert err < 0.25  # coarse-mesh discretization error only


def test_poisson_dense_ell_agree():
    mesh = rectangle_mesh(-3, 3, -3, 3, 12, 12)
    d = solve_poisson_dense(mesh, tol=1e-12)
    e = solve_poisson_ell(mesh, tol=1e-12)
    assert bool(e.cg.converged)
    np.testing.assert_allclose(np.asarray(e.u), np.asarray(d.u),
                               rtol=1e-8, atol=1e-9)


def test_poisson_convergence_order_2d():
    """P1 FEM nodal L2 error must shrink ~O(h^2)."""
    f, exact = model_problem_2d()
    errs = []
    for n in (8, 16, 32):
        mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
        sol = solve_poisson_ell(mesh, f, tol=1e-12)
        assert bool(sol.cg.converged)
        errs.append(_l2_error(mesh, sol.u, exact))
    rate1 = np.log2(errs[0] / errs[1])
    rate2 = np.log2(errs[1] / errs[2])
    assert rate1 > 1.7, f"rates {rate1:.2f}, {rate2:.2f}, errors {errs}"
    assert rate2 > 1.8, f"rates {rate1:.2f}, {rate2:.2f}, errors {errs}"


def test_poisson_3d_ell():
    f, exact = model_problem_3d()
    mesh = box_mesh(-3, 3, -3, 3, -3, 3, 8, 8, 8)
    sol = solve_poisson_ell(mesh, f, tol=1e-10)
    assert bool(sol.cg.converged)
    ue = exact(mesh.coords)
    err = np.sqrt(np.mean((np.asarray(sol.u) - ue) ** 2))
    rel = err / np.sqrt(np.mean(ue ** 2))
    assert rel < 0.05, f"relative L2 error {rel}"


def test_jacobi_pcg_fewer_iterations():
    mesh = rectangle_mesh(-3, 3, -3, 3, 24, 24)
    plain = solve_poisson_ell(mesh, tol=1e-10, precondition=False)
    pcg = solve_poisson_ell(mesh, tol=1e-10, precondition=True)
    assert bool(plain.cg.converged) and bool(pcg.cg.converged)
    # On the uniform mesh Jacobi ~ diagonal scaling; iteration counts are
    # close, but the PCG path must not be pathologically worse.
    assert int(pcg.cg.iterations) <= int(plain.cg.iterations) + 5
    np.testing.assert_allclose(np.asarray(pcg.u), np.asarray(plain.u),
                               rtol=1e-6, atol=1e-7)


def test_nonzero_dirichlet():
    """u = x + y is reproduced exactly by P1 elements (f = 0, g = x + y)."""
    from tpufem.assemble.dense import assemble_dense, assemble_vector
    from tpufem.assemble.local import p1_stiffness
    from tpufem.fem.elements import P1Triangle
    from tpufem.solve.bc import apply_dirichlet_dense

    mesh = rectangle_mesh(0, 1, 0, 1, 6, 6)
    ec = jnp.asarray(mesh.element_coords())
    Ke = p1_stiffness(ec, P1Triangle())
    A = assemble_dense(mesh.conn, Ke, mesh.num_nodes)
    b = jnp.zeros(mesh.num_nodes)
    g = jnp.asarray(mesh.coords[:, 0] + mesh.coords[:, 1])
    mask = jnp.asarray(mesh.node_flags != 0)
    A2, b2 = apply_dirichlet_dense(A, b, mask, g)
    res = cg(lambda x: A2 @ x, b2, tol=1e-13, maxiter=2000)
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(g),
                               rtol=1e-9, atol=1e-10)


def test_cg_check_every_batched_matches():
    """check_every>1 must reach the tolerance with the same solution; its
    iteration count rounds up to the batch size."""
    rng = np.random.default_rng(4)
    n = 60
    Q = rng.standard_normal((n, n))
    A = jnp.asarray(Q @ Q.T + n * np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))
    mv = lambda x: A @ x
    r1 = cg(mv, b, tol=1e-10, maxiter=500)
    r4 = cg(mv, b, tol=1e-10, maxiter=500, check_every=4)
    assert bool(r4.converged) and not bool(r4.diverged)
    assert float(r4.residual_norm) <= 1e-10
    it1, it4 = int(r1.iterations), int(r4.iterations)
    assert it1 <= it4 <= it1 + 3 and it4 % 4 == 0
    np.testing.assert_allclose(np.asarray(r4.x), np.asarray(r1.x),
                               rtol=1e-8, atol=1e-10)


def test_cg_check_every_survives_exact_convergence():
    """Steps past exact convergence inside a batch must stay finite (the
    guarded alpha/beta freeze the recurrence; no 0/0)."""
    # 1x1 identity: converges exactly on the first iteration; a batch of 8
    # then executes 7 post-convergence steps
    A = jnp.eye(4)
    b = jnp.asarray([1.0, -2.0, 3.0, 0.5])
    res = cg(lambda x: A @ x, b, tol=1e-12, maxiter=64, check_every=8)
    assert bool(res.converged) and not bool(res.diverged)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(b), rtol=1e-12)
