"""Block smoothed-aggregation AMG for BCSR elasticity (solve.amg_block).

The reference has no solver (SURVEY.md §0); this closes the last
structured-only solver-family cell (VERDICT r3 item 7 follow-on): a
mesh-robust preconditioner for *unstructured* vector systems.  Checks:
(a) rigid_body_modes spans the operator's near-null space; (b) the cycle
is an SPD operator (hard PCG requirement); (c) PCG iteration counts are
mesh-robust and far below block-Jacobi's; (d) the preconditioned solution
matches an unpreconditioned reference; (e) the rank-deficient singleton-
aggregate path is exercised; (f) the solve_elasticity(precond="amg") API.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tpufem.assemble.dense import assemble_vector
from tpufem.fem.space import VectorFunctionSpace
from tpufem.mesh.adjacency import ell_pattern
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.solve.amg_block import build_block_amg, rigid_body_modes
from tpufem.solve.cg import cg
from tpufem.solve.elasticity import elasticity_forms, solve_elasticity
from tpufem.sparse.bcsr import apply_dirichlet_bcsr, assemble_bcsr


def _body_force(x):
    return np.stack([0 * x[..., 0] + 1.0, 0 * x[..., 1] - 0.5], axis=-1)


def _system(n, lam=1.0, mu=1.0, bc=True):
    mesh = perturbed_rectangle_mesh(-1, 1, -1, 1, n, n, jitter=0.2, seed=0)
    V = VectorFunctionSpace(mesh, degree=1)
    wf = elasticity_forms(V, lam, mu, _body_force)
    wf.dtype = jnp.float64
    ec = jnp.asarray(mesh.element_coords(), jnp.float64)
    Ke = wf.element_matrices(ec)
    pat = ell_pattern(V.scalar_dof_conn, V.num_scalar_dofs, pad_to=8)
    A = assemble_bcsr(pat, Ke, block_size=2)
    b = assemble_vector(V.dof_conn, wf.element_vectors(ec), V.num_dofs)
    if bc:
        A, b = apply_dirichlet_bcsr(A, b, jnp.asarray(V.dof_flags))
    return mesh, A, b


def test_rigid_body_modes_span_near_null_space():
    """Before BC elimination the elasticity operator annihilates every
    rigid body mode exactly (translations and the rotation) — the SA
    requirement that makes B the right tentative space."""
    mesh, A, _ = _system(12, bc=False)
    B = rigid_body_modes(mesh.coords)
    assert B.shape == (2 * mesh.num_nodes, 3)
    scale = float(jnp.abs(A.data).max())
    for k in range(B.shape[1]):
        r = np.asarray(A.matvec(jnp.asarray(B[:, k])))
        assert np.abs(r).max() < 1e-10 * scale * max(
            1.0, np.abs(B[:, k]).max()), (k, np.abs(r).max())


def test_block_cycle_is_spd():
    _, A, _ = _system(10)
    h = build_block_amg(A, coords=None, coarse_n=60)
    n = A.shape[0]
    M = np.column_stack(
        [np.asarray(h.apply(jnp.eye(n, dtype=jnp.float64)[:, j]))
         for j in range(n)])
    asym = np.abs(M - M.T).max() / np.abs(M).max()
    assert asym < 1e-10, asym
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0, f"block cycle not PD: min eig {w.min()}"


def test_block_amg_mesh_robust_vs_block_jacobi():
    """RBM-based block SA holds ~constant iterations where block-Jacobi
    doubles per refinement (measured 16/23/25 vs 133/262/~520)."""
    iters = {}
    for n in (24, 48):
        mesh, A, b = _system(n)
        h = build_block_amg(A, coords=np.asarray(mesh.coords))
        res = cg(A.matvec, b, tol=1e-8, maxiter=200, M=h.apply)
        assert bool(res.converged)
        iters[n] = int(res.iterations)
    assert iters[24] <= 30, iters
    assert iters[48] <= 35, iters
    assert iters[48] <= iters[24] + 10, iters


def test_block_amg_solution_matches_unpreconditioned():
    mesh, A, b = _system(24)
    h = build_block_amg(A, coords=np.asarray(mesh.coords))
    res = cg(A.matvec, b, tol=1e-10, maxiter=200, M=h.apply)
    ref = cg(A.matvec, b, tol=1e-12, maxiter=20000)
    assert bool(res.converged) and bool(ref.converged)
    scale = float(np.abs(np.asarray(ref.x)).max())
    assert np.abs(np.asarray(res.x)
                  - np.asarray(ref.x)).max() < 1e-7 * scale


def test_rbm_beats_translations_near_incompressible():
    """lam/mu = 10: the rotation mode in B is what keeps SA effective on
    rotation-rich near-kernels (measured 33-36 vs 59-74 translations)."""
    mesh, A, b = _system(32, lam=10.0)
    h_rbm = build_block_amg(A, coords=np.asarray(mesh.coords), cycle="W")
    h_tr = build_block_amg(A, cycle="W")
    r_rbm = cg(A.matvec, b, tol=1e-8, maxiter=400, M=h_rbm.apply)
    r_tr = cg(A.matvec, b, tol=1e-8, maxiter=400, M=h_tr.apply)
    assert bool(r_rbm.converged) and bool(r_tr.converged)
    assert int(r_rbm.iterations) < int(r_tr.iterations)
    assert int(r_rbm.iterations) <= 60


def test_rank_deficient_aggregates_handled():
    """An aggregate with fewer DOF rows than near-null-space modes
    (sz*b < m) must zero-pad its QR instead of crashing, and the
    hierarchy must still precondition.  m=5 > 2*b guarantees every
    pair/singleton aggregate takes the padding path."""
    mesh, A, b = _system(16)
    rng = np.random.default_rng(0)
    B = np.hstack([rigid_body_modes(mesh.coords),
                   rng.standard_normal((2 * mesh.num_nodes, 2))])
    h = build_block_amg(A, B=B, coarse_n=60)
    assert len(h.levels) >= 1
    assert h.levels[0].m == 5                   # m modes carried
    assert h.levels[0].Qp.block_size == 5       # pad p = max(b=2, m=5)
    res = cg(A.matvec, b, tol=1e-8, maxiter=200, M=h.apply)
    assert bool(res.converged)


def test_banded_transfers_match_gather():
    """transfer="banded" embeds the rectangular block prolongator (b x m
    blocks, b=2 != m=3 rigid modes — the padding path) as square p x p
    banded block matrices.  Identical math => identical iteration counts
    and solutions up to fp summation order (block twin of
    test_amg.py::test_greedy_banded_transfers_match_gather)."""
    mesh, A, b = _system(24)
    hg = build_block_amg(A, coords=np.asarray(mesh.coords),
                         transfer="gather")
    hb = build_block_amg(A, coords=np.asarray(mesh.coords),
                         transfer="banded")
    for lv in hb.levels:
        assert lv.emb is not None and lv.Qp is not None
        assert lv.Qp.block_size == max(lv.A.block_size, lv.m)
        # embedding preserves the level's node bandwidth (+ aggregate
        # span): |i - emb[c]| <= |i - j| + |j - emb[c]| for a member j
        ca = np.asarray(lv.A.cols).astype(np.int64)
        bw_a = int(np.abs(ca - np.arange(ca.shape[0])[:, None]).max())
        for Q in (lv.Qp, lv.Qr):
            c = np.asarray(Q.cols).astype(np.int64)
            bw = int(np.abs(c - np.arange(c.shape[0])[:, None]).max())
            assert bw <= 2 * bw_a + 16, (bw, bw_a)
    rg = cg(A.matvec, b, tol=1e-8, maxiter=200, M=hg.apply)
    rb = cg(A.matvec, b, tol=1e-8, maxiter=200, M=hb.apply)
    assert bool(rg.converged) and bool(rb.converged)
    assert abs(int(rg.iterations) - int(rb.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(rb.x), np.asarray(rg.x),
                               rtol=0, atol=1e-9)


def test_banded_transfers_3d_rigid_modes():
    """3D: b=3 velocity components, m=6 rigid body modes — the heaviest
    block-padding path (p=6, fine-level blocks 3x6 -> 6x6).  The embedded
    cycle must stay a working SPD preconditioner and match the gather
    arm's convergence."""
    from tpufem.mesh.box import box_mesh

    mesh = box_mesh(0, 1, 0, 1, 0, 1, 6, 6, 6)
    V = VectorFunctionSpace(mesh, degree=1)
    wf = elasticity_forms(V, 1.0, 1.0,
                          lambda x: np.stack([0 * x[..., 0] + 1.0,
                                              0 * x[..., 1] - 0.5,
                                              0 * x[..., 2] + 0.25],
                                             axis=-1))
    wf.dtype = jnp.float64
    ec = jnp.asarray(mesh.element_coords(), jnp.float64)
    Ke = wf.element_matrices(ec)
    pat = ell_pattern(V.scalar_dof_conn, V.num_scalar_dofs, pad_to=16)
    A = assemble_bcsr(pat, Ke, block_size=3)
    b = assemble_vector(V.dof_conn, wf.element_vectors(ec), V.num_dofs)
    A, b = apply_dirichlet_bcsr(A, b, jnp.asarray(V.dof_flags))

    hg = build_block_amg(A, coords=np.asarray(mesh.coords), coarse_n=120,
                         transfer="gather")
    hb = build_block_amg(A, coords=np.asarray(mesh.coords), coarse_n=120,
                         transfer="banded")
    assert hb.levels[0].m == 6 and hb.levels[0].Qp.block_size == 6
    rg = cg(A.matvec, b, tol=1e-9, maxiter=300, M=hg.apply)
    rb = cg(A.matvec, b, tol=1e-9, maxiter=300, M=hb.apply)
    assert bool(rg.converged) and bool(rb.converged)
    assert abs(int(rg.iterations) - int(rb.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(rb.x), np.asarray(rg.x),
                               rtol=0, atol=1e-9)


def test_banded_transfer_plans_resolved_at_setup(monkeypatch):
    """Qp/Qr must leave build_block_amg with banded plans RESOLVED on TPU
    (round-4/5 silent-gather disease class: gather transfers measured
    46.9 ms/PCG-iter at 982k DOFs, BENCH_NOTES r5 phase B2)."""
    import jax

    mesh, A, b = _system(12)
    with monkeypatch.context() as m:
        m.setattr(jax, "default_backend", lambda: "tpu")
        hier = build_block_amg(A, coords=np.asarray(mesh.coords),
                               coarse_n=60)
    for lv in hier.levels:
        assert isinstance(lv.A._band, tuple)
        assert isinstance(lv.Qp._band, tuple), "embedded P unresolved"
        assert isinstance(lv.Qr._band, tuple), "embedded P^T unresolved"


def test_solve_elasticity_amg_pallas_path(monkeypatch):
    """precond="amg" composed with matvec="pallas" (the production
    combination at scale): RCM-permuted hierarchy + component-major
    banded CG must reproduce the gather-path solution."""
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    mesh = perturbed_rectangle_mesh(-1, 1, -1, 1, 16, 16, jitter=0.2,
                                    seed=0)
    ref = solve_elasticity(mesh, body_force=_body_force, tol=1e-9,
                           maxiter=2000)
    s = solve_elasticity(mesh, body_force=_body_force, tol=1e-9,
                         maxiter=200, matvec="pallas", precond="amg",
                         interpret=True)
    assert bool(s.cg.converged)
    assert int(s.cg.iterations) <= 30
    scale = float(np.abs(np.asarray(ref.u)).max())
    assert np.abs(np.asarray(s.u)
                  - np.asarray(ref.u)).max() < 1e-7 * scale


def test_solve_elasticity_amg_api():
    mesh = perturbed_rectangle_mesh(-1, 1, -1, 1, 24, 24, jitter=0.2,
                                    seed=0)
    sol_amg = solve_elasticity(mesh, lam=1.0, mu=1.0,
                               body_force=_body_force, tol=1e-8,
                               maxiter=200, precond="amg")
    sol_bj = solve_elasticity(mesh, lam=1.0, mu=1.0,
                              body_force=_body_force, tol=1e-8,
                              maxiter=2000)
    assert bool(sol_amg.cg.converged)
    assert int(sol_amg.cg.iterations) < int(sol_bj.cg.iterations) / 3
    scale = float(np.abs(np.asarray(sol_bj.u)).max())
    assert np.abs(np.asarray(sol_amg.u)
                  - np.asarray(sol_bj.u)).max() < 1e-6 * scale
    with pytest.raises(ValueError):
        solve_elasticity(mesh, precond="nope")


def test_block_amg_resolves_band_plans_at_setup(monkeypatch):
    """Block twin of test_amg.py::test_build_amg_resolves_band_plans_at_
    setup (round-4 hardware regression): every level operator must leave
    build_block_amg with its banded BCSR plan RESOLVED — the hierarchy
    crosses jit boundaries as a pytree argument where cols are tracers,
    and an unresolved matrix silently rides the gather matvec inside
    every cycle (measured 140 ms/PCG-iter vs 0.41 ms banded SpMVs at
    982k DOFs, /tmp/amg_ab_r4.log phases 6b/7b).  Fake TPU backend: plan
    construction is host-side; execution below runs interpreted."""
    import jax

    mesh, A, b = _system(12)
    with monkeypatch.context() as m:
        m.setattr(jax, "default_backend", lambda: "tpu")
        hier = build_block_amg(A, coords=np.asarray(mesh.coords),
                               coarse_n=60)
    assert len(hier.levels) >= 1
    for lv in hier.levels:
        assert isinstance(lv.A._band, tuple), "level operator unresolved"

    # the banded matvec (interpreted here) agrees with the gather matvec
    from tpufem.sparse.bcsr import BCSRMatrix
    lv0 = hier.levels[0].A
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(lv0.shape[0]))
    y_band = np.asarray(lv0.matvec(x))
    gather = BCSRMatrix(lv0.data, lv0.cols)
    gather._band = None
    y_gather = np.asarray(gather.matvec(x))
    np.testing.assert_allclose(y_band, y_gather, rtol=0, atol=1e-11)

    # and the full cycle through a jit boundary (hierarchy as argument)
    # still matches the eager application
    z_eager = np.asarray(hier.apply(jnp.asarray(b)))
    z_jit = np.asarray(jax.jit(lambda h, r: h.apply(r))(hier,
                                                        jnp.asarray(b)))
    np.testing.assert_allclose(z_jit, z_eager, rtol=0, atol=1e-9
                               * max(1.0, float(np.abs(z_eager).max())))
