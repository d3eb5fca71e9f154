"""Chebyshev-Jacobi polynomial preconditioner (VERDICT.md r2 item 5).

The mesh-independent(ish) preconditioner for unstructured ELL systems where
geometric multigrid's nested grids do not exist.  Checks: (a) the operator
is symmetric positive definite (a hard requirement for PCG); (b) it cuts
PCG iteration counts by ~the polynomial degree vs plain Jacobi on a
genuinely unstructured system; (c) the eigenvalue estimator upper-bounds
the true spectrum.
"""
import numpy as np
import jax.numpy as jnp

from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.dense import assemble_vector
from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d
from tpufem.solve.precond import (chebyshev, estimate_lambda_max, jacobi,
                                  lambda_max_bound)


def _system(n=24, seed=0):
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=0.25,
                                    seed=seed)
    ec = jnp.asarray(mesh.element_coords())
    element = P1Triangle()
    rule = triangle_rule(5)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    Ke = p1_stiffness(ec, element)
    A = assemble_ell(pat, Ke)
    f, _ = model_problem_2d()
    be = element_load(ec, element, rule, f)
    b = assemble_vector(mesh.conn, be, mesh.num_nodes)
    bc = jnp.asarray(mesh.node_flags != 0)
    A, b = apply_dirichlet_ell(A, b, bc)
    return A, b


def test_chebyshev_preconditioner_is_spd():
    A, _ = _system(n=10)
    n = A.shape[0]
    lmax = estimate_lambda_max(A.matvec, A.diagonal(), n,
                               dtype=A.dtype)
    M = chebyshev(A.matvec, A.diagonal(), degree=6, lmax=lmax)
    # materialize M^-1 by applying to the identity
    cols = [np.asarray(M(jnp.zeros(n, A.dtype).at[i].set(1.0)))
            for i in range(n)]
    Mmat = np.stack(cols, axis=1)
    assert np.abs(Mmat - Mmat.T).max() < 1e-8 * np.abs(Mmat).max()
    w = np.linalg.eigvalsh(0.5 * (Mmat + Mmat.T))
    assert w.min() > 0, f"preconditioner not PD: min eig {w.min()}"


def test_lambda_max_upper_bounds_spectrum():
    A, _ = _system(n=12)
    d = np.asarray(A.diagonal())
    Ad = np.asarray(A.to_dense()) / d[:, None]
    true_lmax = np.abs(np.linalg.eigvals(Ad)).max()
    est = estimate_lambda_max(A.matvec, A.diagonal(), A.shape[0],
                              dtype=A.dtype)
    assert est >= 0.99 * true_lmax          # boost covers estimator slack
    assert est <= 1.3 * true_lmax


def test_lambda_max_bound_never_underestimates():
    """Gershgorin bound >= true lmax on every seed (the power-iteration
    estimate underestimated at 1M rows and diverged Chebyshev-PCG —
    BENCH_NOTES r3; the bound is the production default)."""
    for seed in range(4):
        A, _ = _system(n=12, seed=seed)
        d = np.asarray(A.diagonal())
        Ad = np.asarray(A.to_dense()) / d[:, None]
        true_lmax = np.abs(np.linalg.eigvals(Ad)).max()
        bound = lambda_max_bound(A)
        assert bound >= true_lmax, (bound, true_lmax)
        assert bound <= 2.5 * true_lmax     # not uselessly loose


def test_chebyshev_with_bound_converges():
    A, b = _system(n=40)
    M = chebyshev(A.matvec, A.diagonal(), degree=10,
                  lmax=lambda_max_bound(A))
    res = cg(A.matvec, b, tol=1e-8, maxiter=500, M=M)
    assert bool(res.converged), int(res.iterations)


def test_chebyshev_cuts_iterations_vs_jacobi():
    A, b = _system(n=40)
    res_j = cg(A.matvec, b, tol=1e-8, maxiter=2000, M=jacobi(A))
    lmax = estimate_lambda_max(A.matvec, A.diagonal(), A.shape[0],
                               dtype=A.dtype)
    M = chebyshev(A.matvec, A.diagonal(), degree=10, lmax=lmax)
    res_c = cg(A.matvec, b, tol=1e-8, maxiter=2000, M=M)
    assert bool(res_j.converged) and bool(res_c.converged)
    it_j, it_c = int(res_j.iterations), int(res_c.iterations)
    # degree-10 polynomial should cut outer iterations by >= 4x
    assert it_c * 4 <= it_j, (it_c, it_j)
    # and the two solutions agree
    err = float(jnp.linalg.norm(res_c.x - res_j.x)
                / jnp.linalg.norm(res_j.x))
    assert err < 1e-6, err


def test_chebyshev_multi_rhs_matches_columnwise():
    """The polynomial is linear with fixed coefficients, so applying it to
    an [n, q] block through a multi-RHS matvec must equal the column-wise
    application exactly — the property the batched eigen inner solves rely
    on (examples/modal_analysis.py --inner-precond chebyshev)."""
    A, _ = _system(20)
    lmax = lambda_max_bound(A)
    M1 = chebyshev(A.matvec, A.diagonal(), degree=10, lmax=lmax)
    Mq = chebyshev(A.matvec_multi, A.diagonal(), degree=10, lmax=lmax)
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.standard_normal((A.shape[0], 4)))
    Z = Mq(R)
    Zcols = jnp.stack([M1(R[:, j]) for j in range(4)], axis=1)
    np.testing.assert_allclose(np.asarray(Z), np.asarray(Zcols),
                               rtol=0, atol=1e-12)
