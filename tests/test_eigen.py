"""Modal analysis (tpufem.solve.eigen): smallest generalized eigenpairs.

Golden check: the Dirichlet Laplacian on (-3,3)² has analytic modes
lambda_ij = pi² (i² + j²) / 36 — the computed FEM eigenvalues must match
to discretization accuracy (O(h²)), including the (1,2)/(2,1) double
eigenvalue, with M_L-orthonormal eigenvectors and tiny algebraic
residuals.
"""
import numpy as np

import jax.numpy as jnp

from tpufem.assemble.dense import assemble_vector
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import element_mass, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.rectangle import rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.eigen import smallest_eigenpairs
from tpufem.solve.precond import jacobi


def _system(n):
    mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    ec = jnp.asarray(mesh.element_coords())
    A = assemble_ell(pat, p1_stiffness(ec, P1Triangle()))
    bc = jnp.asarray(mesh.node_flags != 0)
    A, _ = apply_dirichlet_ell(A, jnp.zeros(mesh.num_nodes), bc)
    Me = element_mass(ec, P1Triangle(), triangle_rule(5))
    mL = assemble_vector(jnp.asarray(mesh.conn), Me.sum(-1),
                         mesh.num_nodes)
    return mesh, A, mL, bc


def _analytic(k):
    return np.array(sorted(np.pi ** 2 / 36 * (i * i + j * j)
                           for i in range(1, 5)
                           for j in range(1, 5)))[:k]


def test_laplacian_modes_match_analytic():
    mesh, A, mL, bc = _system(48)
    res = smallest_eigenpairs(A.matvec, mesh.num_nodes, 5,
                              lumped_mass=mL, M=jacobi(A), bc_mask=bc,
                              inner_iters=60, outer_iters=25)
    lam = np.asarray(res.eigenvalues)
    exact = _analytic(5)
    rel = np.abs(lam - exact) / exact
    assert rel.max() < 5e-3, (lam, exact)       # O(h^2) at n=48
    assert np.asarray(res.residual_norms).max() < 1e-5
    # double eigenvalue (1,2)/(2,1) resolved as a pair
    assert abs(lam[1] - lam[2]) < 1e-6 * lam[1]
    # M_L-orthonormality
    U = np.asarray(res.eigenvectors)
    G = U.T @ (np.asarray(mL)[:, None] * U)
    assert np.abs(G - np.eye(5)).max() < 1e-8


def test_modes_converge_at_second_order():
    errs = {}
    for n in (24, 48):
        mesh, A, mL, bc = _system(n)
        res = smallest_eigenpairs(A.matvec, mesh.num_nodes, 1,
                                  lumped_mass=mL, M=jacobi(A),
                                  bc_mask=bc, inner_iters=60,
                                  outer_iters=20)
        lam1 = float(res.eigenvalues[0])
        errs[n] = abs(lam1 - np.pi ** 2 / 18)
    rate = np.log2(errs[24] / errs[48])
    assert rate > 1.6, (errs, rate)             # ~O(h^2)


def test_standard_problem_no_mass():
    """Without lumped_mass the solver returns the smallest eigenpairs of
    the matrix itself — cross-checked against dense eigh on a small
    system (interior block; constrained rows carry identity)."""
    mesh, A, _, bc = _system(10)
    res = smallest_eigenpairs(A.matvec, mesh.num_nodes, 3, bc_mask=bc,
                              M=jacobi(A), inner_iters=80,
                              outer_iters=25)
    Ad = np.asarray(A.to_dense())
    free = ~np.asarray(bc)
    w = np.linalg.eigvalsh(Ad[np.ix_(free, free)])
    np.testing.assert_allclose(np.asarray(res.eigenvalues), w[:3],
                               rtol=1e-6)


def test_cg_fixed_block_matches_columns():
    """Lockstep batched CG == q independent cg_fixed chains."""
    from tpufem.solve.cg import cg_fixed, cg_fixed_block
    mesh, A, mL, bc = _system(24)
    rng = np.random.default_rng(0)
    B = jnp.asarray(np.where(np.asarray(bc)[:, None], 0.0,
                             rng.standard_normal((mesh.num_nodes, 4))))
    M = jacobi(A)
    import jax
    Xb, Rb = cg_fixed_block(A.matvec_multi, B, 25,
                            M_multi=jax.vmap(M, in_axes=1, out_axes=1))
    for j in range(4):
        xj, rj = cg_fixed(A.matvec, B[:, j], 25, M=M)
        dx = np.abs(np.asarray(Xb[:, j]) - np.asarray(xj)).max()
        scale = max(1e-30, float(np.abs(np.asarray(xj)).max()))
        assert dx / scale < 1e-8, (j, dx / scale)


def test_batched_eigen_matches_serial():
    """matvec_multi-batched subspace iteration == the column-serial
    path: identical algorithm, shared SpMV stream (VERDICT r4 item 7)."""
    mesh, A, mL, bc = _system(32)
    kw = dict(lumped_mass=mL, M=jacobi(A), bc_mask=bc,
              inner_iters=50, outer_iters=20)
    ser = smallest_eigenpairs(A.matvec, mesh.num_nodes, 4, **kw)
    bat = smallest_eigenpairs(A.matvec, mesh.num_nodes, 4,
                              matvec_multi=A.matvec_multi, **kw)
    ls, lb = np.asarray(ser.eigenvalues), np.asarray(bat.eigenvalues)
    assert np.abs(ls - lb).max() / np.abs(ls).max() < 1e-9
    rs = float(np.max(np.asarray(ser.residual_norms)))
    rb = float(np.max(np.asarray(bat.residual_norms)))
    assert rb < max(10.0 * rs, 1e-8), (rb, rs)


def test_amg_inner_preconditioner():
    """AMG V-cycle as the inner-CG preconditioner (the at-scale default:
    Jacobi left 17% and Chebyshev 6.6% eigenvalue error at 491k DOFs —
    the fixed inner budget bottoms out at ~6e-2 solve accuracy as
    cond(A)~1/h^2 grows, which floors the outer Rayleigh-Ritz; an AMG
    inner solve stays mesh-independently accurate).  Both the batched
    (apply_multi) and serial (apply) arms must converge — the serial arm
    also pins the cg_fixed 0/0 guard: a strong preconditioner converges
    the chain INSIDE the fixed budget, and unguarded alpha = rz/pAp then
    NaN-poisons every eigenpair."""
    from tpufem.solve.amg import build_amg
    mesh, A, mL, bc = _system(48)
    hier = build_amg(A, coarse_n=100, strength=0.08)
    exact = _analytic(5)
    for kw in (dict(matvec_multi=A.matvec_multi,
                    M_multi=hier.apply_multi),
               dict()):
        res = smallest_eigenpairs(A.matvec, mesh.num_nodes, 5,
                                  lumped_mass=mL, M=hier.apply,
                                  bc_mask=bc, inner_iters=20,
                                  outer_iters=25, **kw)
        lam = np.asarray(res.eigenvalues)
        assert np.isfinite(lam).all(), lam
        rel = np.abs(lam - exact) / exact
        assert rel.max() < 5e-3, (lam, exact)
        assert np.asarray(res.residual_norms).max() < 1e-5


def test_mixed_precision_matches_fp64():
    """Mixed precision (fp64 subspace/Gram/residuals + fp32 inner solves
    wrapped in iterative refinement, matvec_hi_multi) must reach the
    same eigenvalues as the pure-fp64 path.  This is the at-scale
    default: the pure-fp32 SpMV floor eps32*cond(A) makes eigenvalues
    WRONG past ~100k DOFs regardless of inner solver (hardware: +0.14
    uniform inflation at 491k DOFs under both Chebyshev and AMG inners,
    BENCH_NOTES r5 phases D1/E3)."""
    import jax
    from tpufem.sparse.ell import ELLMatrix, ell_matvec_multi
    from tpufem.solve.amg import build_amg
    if not jax.config.read("jax_enable_x64"):
        import pytest
        pytest.skip("needs x64")
    mesh, A64, mL, bc = _system(48)
    data64 = jnp.asarray(A64.data, jnp.float64)
    A32 = ELLMatrix(A64.data.astype(jnp.float32), A64.cols,
                    A64.row_lengths, A64.diag_pos)
    hier = build_amg(A32, coarse_n=100, strength=0.08)
    res = smallest_eigenpairs(
        A32.matvec, mesh.num_nodes, 5, lumped_mass=mL, M=hier.apply,
        bc_mask=bc, inner_iters=20, outer_iters=25,
        matvec_multi=A32.matvec_multi, M_multi=hier.apply_multi,
        matvec_hi_multi=lambda X: ell_matvec_multi(data64, A64.cols, X))
    lam = np.asarray(res.eigenvalues)
    assert lam.dtype == np.float64
    exact = _analytic(5)
    assert np.abs(lam - exact).max() / exact.max() < 5e-3, lam
    assert np.asarray(res.residual_norms).max() < 1e-4
    # pure-fp64 reference on the same fp32-quantized operator entries:
    # eigenvalues must agree far below discretization error (the two
    # paths use different inexact inner solvers, so agreement is ~1e-4
    # relative, not eps64 — the disease this guards against is the
    # +0.14 ABSOLUTE inflation, 3 orders larger)
    ref = smallest_eigenpairs(A32.matvec, mesh.num_nodes, 5,
                              lumped_mass=mL, M=jacobi(A32), bc_mask=bc,
                              inner_iters=60, outer_iters=25,
                              dtype=jnp.float64)
    dl = np.abs(lam - np.asarray(ref.eigenvalues)).max()
    assert dl / exact.max() < 3e-4, dl


def test_subspace_stepper_composition_matches_fused():
    """subspace_stepper's (X0, step, finish) host-composed loop must
    reproduce smallest_eigenpairs exactly — the contract behind the
    modal example's chunked outer loop at scale (one fused multi-minute
    device execution trips relay limits at 1M DOFs, BENCH_NOTES r5
    phase F3/G2)."""
    from tpufem.solve.eigen import subspace_stepper
    mesh, A, mL, bc = _system(16)
    kw = dict(lumped_mass=mL, M=jacobi(A), bc_mask=bc,
              inner_iters=15, outer_iters=4, buffer=3)
    fused = smallest_eigenpairs(A.matvec, mesh.num_nodes, 3, **kw)
    X0, step, finish = subspace_stepper(A.matvec, mesh.num_nodes, 3, **kw)
    X = X0
    for _ in range(4):
        X = step(X)
    stepped = finish(X)
    np.testing.assert_allclose(np.asarray(stepped.eigenvalues),
                               np.asarray(fused.eigenvalues),
                               rtol=1e-12, atol=0)
    np.testing.assert_allclose(np.asarray(stepped.eigenvectors),
                               np.asarray(fused.eigenvectors),
                               rtol=0, atol=1e-12)
