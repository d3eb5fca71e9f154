"""Smoothed-aggregation AMG (VERDICT.md r2 item 5, the "ambitious" option).

Checks: (a) native/numpy aggregation parity and partition sanity; (b) the
Galerkin coarse operator equals the dense P^T A P; (c) the V-cycle is a
symmetric positive definite operator (hard PCG requirement); (d) PCG
iteration counts are (near) mesh-independent — the property Chebyshev-
Jacobi lacks; (e) coarse levels inherit the band so every level's SpMV
stays on the banded Pallas fast path.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tpufem.assemble.dense import assemble_vector
from tpufem.assemble.ell import assemble_ell
from tpufem.assemble.local import element_load, p1_stiffness
from tpufem.fem.elements import P1Triangle
from tpufem.fem.quadrature import triangle_rule
from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
from tpufem.mesh.core import Mesh
from tpufem.mesh.rectangle import perturbed_rectangle_mesh
from tpufem.solve.bc import apply_dirichlet_ell
from tpufem.solve.cg import cg
from tpufem.solve.poisson import model_problem_2d
from tpufem.solve.amg import build_amg, greedy_aggregate


def _system(n, seed=0):
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, n, n, jitter=0.25,
                                    seed=seed)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    perm = reverse_cuthill_mckee(pat.cols)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=perm.dtype)
    mesh = Mesh(coords=np.ascontiguousarray(mesh.coords[perm]),
                conn=inv[mesh.conn].astype(mesh.conn.dtype),
                node_flags=np.ascontiguousarray(mesh.node_flags[perm]),
                cell_type=mesh.cell_type)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    ec = jnp.asarray(mesh.element_coords())
    element = P1Triangle()
    A = assemble_ell(pat, p1_stiffness(ec, element))
    f, exact = model_problem_2d()
    b = assemble_vector(jnp.asarray(mesh.conn),
                        element_load(ec, element, triangle_rule(5), f),
                        mesh.num_nodes)
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(mesh.node_flags != 0))
    return mesh, A, b, exact


def test_greedy_aggregate_native_matches_numpy():
    _, A, _, _ = _system(30)
    cols = np.asarray(A.cols)
    a_py, na_py = greedy_aggregate(cols, use_native=False)
    a_nat, na_nat = greedy_aggregate(cols, use_native=True)
    assert na_py == na_nat
    assert (a_py == a_nat).all()
    # valid partition: every node assigned, ids dense, sane sizes
    assert a_py.min() == 0 and a_py.max() == na_py - 1
    sizes = np.bincount(a_py)
    assert sizes.min() >= 1 and sizes.max() <= 16
    # renumbered by first member: first-occurrence order is 0, 1, 2, ...
    firsts = a_py[np.sort(np.unique(a_py, return_index=True)[1])]
    assert (firsts == np.arange(na_py)).all()


def test_galerkin_matches_dense_triple_product():
    _, A, _, _ = _system(16)
    hier = build_amg(A, coarse_n=20, max_levels=1, transfer="gather")
    lv = hier.levels[0]
    n = A.shape[0]
    Ad = np.asarray(A.to_dense(), np.float64)
    nc = int(np.asarray(lv.p_cols).max()) + 1
    P = np.zeros((n, nc))
    np.add.at(P, (np.repeat(np.arange(n), lv.p_data.shape[1]),
                  np.asarray(lv.p_cols).ravel()),
              np.asarray(lv.p_data, np.float64).ravel())
    ref = P.T @ Ad @ P
    # coarse operator is the coarsest here: invert the stored inverse
    got = np.linalg.inv(np.asarray(hier.coarse_inv, np.float64))
    assert np.abs(got - ref).max() < 1e-5 * np.abs(ref).max()
    # restriction is exactly P^T
    R = np.zeros((nc, n))
    np.add.at(R, (np.repeat(np.arange(nc), lv.r_data.shape[1]),
                  np.asarray(lv.r_cols).ravel()),
              np.asarray(lv.r_data, np.float64).ravel())
    assert np.abs(R - P.T).max() < 1e-12

    # the banded-embedded representation stores the SAME P: un-embed Qp
    # (col emb[c] -> c) and compare entrywise
    hb = build_amg(A, coarse_n=20, max_levels=1, transfer="banded")
    lvb = hb.levels[0]
    emb = np.asarray(lvb.emb, np.int64)
    back = np.full(n, -1, np.int64)
    back[emb] = np.arange(emb.size)
    Pq = np.zeros((n, nc))
    qd = np.asarray(lvb.Qp.data, np.float64)
    qc = np.asarray(lvb.Qp.cols, np.int64)
    for k in range(qd.shape[1]):
        cc = back[qc[:, k]]
        ok = cc >= 0
        np.add.at(Pq, (np.flatnonzero(ok), cc[ok]),
                  qd[np.flatnonzero(ok), k])
    assert np.abs(Pq - P).max() < 1e-12 * max(1.0, np.abs(P).max())


def test_vcycle_is_spd():
    _, A, _, _ = _system(12)
    hier = build_amg(A, coarse_n=30)
    n = A.shape[0]
    cols = [np.asarray(hier.apply(jnp.zeros(n, A.dtype).at[i].set(1.0)))
            for i in range(n)]
    M = np.stack(cols, axis=1)
    assert np.abs(M - M.T).max() < 1e-6 * np.abs(M).max()
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0, f"V-cycle not PD: min eig {w.min()}"


def test_interval_transfers_match_explicit_p():
    """Matrix-free interval transfers == dense P / P^T application.

    P = (I - omega D^-1 A) T must be applied EXACTLY (same operator the
    Galerkin product used) or the preconditioner loses symmetry."""
    _, A, _, _ = _system(16)
    hier = build_amg(A, coarse_n=20, max_levels=1, aggregation="interval",
                     interval_size=6)
    from tpufem.solve.amg import _prolong, _restrict
    lv = hier.levels[0]
    n = A.shape[0]
    s = lv.s
    nc = -(-n // s)
    Ad = np.asarray(A.to_dense(), np.float64)
    agg = np.arange(n) // s
    T = np.zeros((n, nc))
    T[np.arange(n), agg] = np.asarray(lv.tv, np.float64)
    D_inv = np.diag(np.asarray(lv.inv_diag, np.float64))
    P = (np.eye(n) - lv.omega * D_inv @ Ad) @ T

    rng = np.random.default_rng(0)
    xc = rng.standard_normal(nc).astype(np.float32)
    r = rng.standard_normal(n).astype(np.float32)
    got_p = np.asarray(_prolong(lv, jnp.asarray(xc)), np.float64)
    got_r = np.asarray(_restrict(lv, jnp.asarray(r)), np.float64)
    assert np.abs(got_p - P @ xc).max() < 1e-4 * np.abs(P @ xc).max()
    assert np.abs(got_r - P.T @ r).max() < 1e-4 * np.abs(P.T @ r).max()


def test_interval_vcycle_is_spd():
    import jax
    _, A, _, _ = _system(12)
    hier = build_amg(A, coarse_n=30, aggregation="interval")
    n = A.shape[0]
    ap = jax.jit(hier.apply)   # one trace; eager per-column is ~10 min
    cols = [np.asarray(ap(jnp.zeros(n, A.dtype).at[i].set(1.0)))
            for i in range(n)]
    M = np.stack(cols, axis=1)
    assert np.abs(M - M.T).max() < 1e-6 * np.abs(M).max()
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0, f"interval V-cycle not PD: min eig {w.min()}"


def test_interval_wcycle_is_spd():
    """gamma=2: coarse solve becomes B = 2C - C A_c C — still SPD when the
    coarse cycle C is SPD and convergent (spec(C A_c) in (0,2)).
    coarse_n small enough for >= 2 levels, else gamma never engages."""
    import jax
    _, A, _, _ = _system(12)
    hier = build_amg(A, coarse_n=10, aggregation="interval", cycle="W")
    assert len(hier.levels) >= 2 and hier.gamma == 2
    n = A.shape[0]
    ap = jax.jit(hier.apply)
    cols = [np.asarray(ap(jnp.zeros(n, A.dtype).at[i].set(1.0)))
            for i in range(n)]
    M = np.stack(cols, axis=1)
    assert np.abs(M - M.T).max() < 1e-6 * np.abs(M).max()
    w = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert w.min() > 0, f"interval W-cycle not PD: min eig {w.min()}"


def test_interval_wcycle_amg_pcg_bounded_iteration_growth(monkeypatch):
    """interval aggregation is 1D semicoarsening along the RCM line, so a
    V-cycle's iteration count grows with the mesh (21 -> 49 over a 16x row
    increase); the W-cycle (gamma=2) bounds the growth (21 -> 38 measured)
    while every transfer stays gather-free.  Greedy aggregation (tested
    below) stays flat but pays gather transfers per cycle — at 1M rows the
    gathers cost ~40x the whole interval W-cycle (BENCH_NOTES r3).

    Iteration counts are matvec-backend-independent, so this test forces
    the gather SpMV: the interpret-mode banded kernel at n=160 costs ~7
    CPU-minutes and its numerics are covered by the parity tests above.
    """
    import tpufem.sparse.ell as ell_mod
    monkeypatch.setattr(ell_mod, "_AUTO_BAND_MAX", -1)
    # _AUTO_BAND_MAX=-1 alone flips build_amg's wide-band priming branch
    # (bw_l > -1 is always true) into priming EVERY level through the
    # interpreted Pallas kernel; TPUFEM_BAND_DISPATCH=0 is honored by both
    # the auto-dispatch and the priming branch, keeping this on gather SpMV.
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    iters = {}
    for n in (40, 160):
        mesh, A, b, exact = _system(n)
        hier = build_amg(A, coarse_n=300, aggregation="interval",
                         cycle="W")
        res = cg(A.matvec, b, tol=1e-8, maxiter=100, M=hier.apply)
        assert bool(res.converged)
        iters[n] = int(res.iterations)
        u = np.asarray(res.x)
        ue = exact(mesh.coords)
        err = float(np.sqrt(np.mean((u - ue) ** 2))
                    / np.sqrt(np.mean(ue ** 2)))
        assert err < 20.0 / (n * n)
    assert iters[160] <= 2.0 * iters[40], iters
    assert iters[160] <= 45, iters
    # coarse levels stay banded (the whole point of interval numbering)
    for lv in hier.levels:
        c = np.asarray(lv.A.cols).astype(np.int64)
        bw = int(np.abs(c - np.arange(c.shape[0])[:, None]).max())
        assert bw <= 4096


def test_amg_pcg_mesh_independent_iterations(monkeypatch):
    # iteration counts are matvec-backend-independent: force the gather
    # SpMV (the interpreted banded kernel at n=160 costs CPU-minutes; its
    # numerics are covered by the sparse parity tests)
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    iters = {}
    for n in (40, 160):
        mesh, A, b, exact = _system(n)
        hier = build_amg(A, coarse_n=300)
        res = cg(A.matvec, b, tol=1e-8, maxiter=100, M=hier.apply)
        assert bool(res.converged)
        iters[n] = int(res.iterations)
        u = np.asarray(res.x)
        ue = exact(mesh.coords)
        err = float(np.sqrt(np.mean((u - ue) ** 2))
                    / np.sqrt(np.mean(ue ** 2)))
        assert err < 20.0 / (n * n)      # O(h^2) discretization error
    # 16x the unknowns may cost at most ~60% more iterations
    assert iters[160] <= 1.6 * iters[40], iters
    assert iters[160] <= 25, iters
    # setup stays lean: low operator complexity, banded coarse levels
    hier = build_amg(A, coarse_n=300)
    assert hier.operator_complexity < 1.5
    for lv in hier.levels:
        c = np.asarray(lv.A.cols).astype(np.int64)
        bw = int(np.abs(c - np.arange(c.shape[0])[:, None]).max())
        assert bw <= 4096   # every level qualifies for the banded kernel


def test_greedy_banded_transfers_match_gather(monkeypatch):
    """transfer="banded" embeds the rectangular prolongator as a square
    banded matrix on each aggregate's first fine member — the SAME P
    applied through a banded SpMV + sorted 1-D gather/scatter instead of
    the O(n*Kp) ELL transfer gathers.  Identical math => identical
    iteration counts and solutions (up to fp summation order)."""
    import tpufem.sparse.ell as ell_mod
    monkeypatch.setattr(ell_mod, "_AUTO_BAND_MAX", -1)
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    _, A, b, _ = _system(60)
    hg = build_amg(A, coarse_n=300, aggregation="greedy",
                   transfer="gather")
    hb = build_amg(A, coarse_n=300, aggregation="greedy",
                   transfer="banded")
    rg = cg(A.matvec, b, tol=1e-8, maxiter=100, M=hg.apply)
    rb = cg(A.matvec, b, tol=1e-8, maxiter=100, M=hb.apply)
    assert bool(rg.converged) and bool(rb.converged)
    assert abs(int(rg.iterations) - int(rb.iterations)) <= 1
    np.testing.assert_allclose(np.asarray(rb.x), np.asarray(rg.x),
                               rtol=0, atol=1e-7)
    # the embedded transfer matrices stay banded (the whole point)
    for lv in hb.levels:
        for Q in (lv.Qp, lv.Qr):
            c = np.asarray(Q.cols).astype(np.int64)
            bw = int(np.abs(c - np.arange(c.shape[0])[:, None]).max())
            assert bw <= 4 * 61, bw      # ~fine bandwidth + aggregate span


def test_greedy_strength_amg_on_p2_system(monkeypatch):
    """High-order robustness (VERDICT r3 item 7): greedy aggregation on
    the strength-filtered graph (|a_ij| >= 0.08 sqrt(a_ii a_jj)) with
    banded-embedded transfers converges mesh-independently on P2 Poisson
    — measured 16 iters at 6.5k DOFs, 17 at 26k, 18-19 at 103k (vs ~82
    for interval-W, which ignores the vertex/edge DOF interleave)."""
    import tpufem.sparse.ell as ell_mod
    monkeypatch.setattr(ell_mod, "_AUTO_BAND_MAX", -1)
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    iters = {}
    for n in (40, 80):
        Ap, bp = _p2_system(n)
        hier = build_amg(Ap, aggregation="greedy", strength=0.08,
                         coarse_n=300)
        res = cg(Ap.matvec, bp, tol=1e-9, maxiter=100, M=hier.apply)
        assert bool(res.converged)
        iters[n] = int(res.iterations)
    assert iters[40] <= 25, iters
    assert iters[80] <= 25, iters                  # mesh-independent
    assert iters[80] <= iters[40] + 5, iters


@pytest.mark.slow
def test_greedy_strength_amg_p2_100k(monkeypatch):
    """The 100k-DOF bar from VERDICT r3 item 7: <= 40 AMG-PCG iterations
    at >= 100k P2 DOFs (measured 18-19)."""
    import tpufem.sparse.ell as ell_mod
    monkeypatch.setattr(ell_mod, "_AUTO_BAND_MAX", -1)
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    Ap, bp = _p2_system(160)
    assert Ap.data.shape[0] >= 100_000
    hier = build_amg(Ap, aggregation="greedy", strength=0.08, coarse_n=300)
    res = cg(Ap.matvec, bp, tol=1e-9, maxiter=100, M=hier.apply)
    assert bool(res.converged)
    assert int(res.iterations) <= 40, int(res.iterations)


def _p2_system(n):
    """RCM-reordered P2 Poisson ELL system on an n x n rectangle."""
    import jax.numpy as jnp
    from tpufem.fem.space import FunctionSpace
    from tpufem.forms.language import SpatialCoordinate, dot, grad
    from tpufem.forms.weakform import WeakForm
    from tpufem.mesh.rectangle import rectangle_mesh
    from tpufem.sparse.ell import ELLMatrix, reorder_ell

    mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
    V = FunctionSpace(mesh, degree=2)
    X = SpatialCoordinate(V)
    f = 36 - 2 * (X[0] ** 2 + X[1] ** 2)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)),
                           lambda v: f * v)
    A, b = wf.assemble(format="ell")
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(V.dof_flags))
    perm = reverse_cuthill_mckee(np.asarray(A.cols))
    data_p, cols_p = reorder_ell(np.asarray(A.data), np.asarray(A.cols),
                                 perm)
    return (ELLMatrix(jnp.asarray(data_p), jnp.asarray(cols_p)),
            jnp.asarray(np.asarray(b)[perm]))


def test_greedy_strength_amg_on_anisotropic_operator(monkeypatch):
    """-div(diag(1, eps) grad u), eps = 0.01: weak y-couplings glue
    unrelated DOFs into aggregates without strength filtering (54-75
    PCG iterations, growing); filtering recovers line aggregation along
    the strong direction — 8-10 iterations, mesh-independent (the
    classical SA semicoarsening result, Vanek '96)."""
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    from tpufem.fem.space import FunctionSpace
    from tpufem.forms.language import SpatialCoordinate, grad
    from tpufem.forms.weakform import WeakForm
    from tpufem.mesh.rectangle import rectangle_mesh
    from tpufem.sparse.ell import ELLMatrix, reorder_ell

    eps = 0.01
    iters = {}
    for n in (64, 128):
        mesh = rectangle_mesh(-3, 3, -3, 3, n, n)
        V = FunctionSpace(mesh, degree=1)
        X = SpatialCoordinate(V)
        wf = WeakForm(V).build(
            lambda u, v: (grad(u)[0] * grad(v)[0]
                          + eps * grad(u)[1] * grad(v)[1]),
            lambda v: (36 - 2 * (X[0] ** 2 + X[1] ** 2)) * v)
        A, b = wf.assemble(format="ell")
        A, b = apply_dirichlet_ell(A, b, jnp.asarray(V.dof_flags))
        perm = reverse_cuthill_mckee(np.asarray(A.cols))
        dp, cp = reorder_ell(np.asarray(A.data), np.asarray(A.cols),
                             perm)
        Ap = ELLMatrix(jnp.asarray(dp), jnp.asarray(cp))
        bp = jnp.asarray(np.asarray(b)[perm])
        h = build_amg(Ap, coarse_n=300, aggregation="greedy",
                      strength=0.08)
        res = cg(Ap.matvec, bp, tol=1e-8, maxiter=100, M=h.apply)
        assert bool(res.converged)
        iters[n] = int(res.iterations)
        if n == 64:     # unfiltered comparison once (documented contrast)
            h0 = build_amg(Ap, coarse_n=300, aggregation="greedy")
            r0 = cg(Ap.matvec, bp, tol=1e-8, maxiter=300, M=h0.apply)
            assert int(r0.iterations) > 2 * iters[n]
    assert iters[64] <= 15 and iters[128] <= 15, iters
    assert iters[128] <= iters[64] + 3, iters


def test_greedy_strength_amg_on_3d_tet_system(monkeypatch):
    """AMG is dimension-agnostic: perturbed 3D tet P1 Poisson (K=16 ELL,
    RCM bandwidth ~ n^2) converges in <= 15 iterations with
    greedy+strength (measured 9; interval-W 17, plain greedy 13)."""
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    from tpufem.fem.elements import P1Tetrahedron
    from tpufem.mesh.box import box_mesh

    n = 16
    mesh0 = box_mesh(-3, 3, -3, 3, -3, 3, n, n, n)
    rng = np.random.default_rng(0)
    h3 = 6.0 / n
    pert = rng.uniform(-0.2 * h3, 0.2 * h3, mesh0.coords.shape)
    coords = mesh0.coords + np.where(
        (mesh0.node_flags != 0)[:, None], 0.0, pert)
    mesh0 = Mesh(coords=coords, conn=mesh0.conn,
                 node_flags=mesh0.node_flags, cell_type=mesh0.cell_type)
    pat = ell_pattern(mesh0.conn, mesh0.num_nodes, pad_to=16)
    perm = reverse_cuthill_mckee(pat.cols)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size)
    mesh0 = Mesh(coords=np.ascontiguousarray(mesh0.coords[perm]),
                 conn=inv[mesh0.conn].astype(mesh0.conn.dtype),
                 node_flags=np.ascontiguousarray(mesh0.node_flags[perm]),
                 cell_type=mesh0.cell_type)
    pat = ell_pattern(mesh0.conn, mesh0.num_nodes, pad_to=16)
    ec = jnp.asarray(mesh0.element_coords())
    A = assemble_ell(pat, p1_stiffness(ec, P1Tetrahedron()))
    b = jnp.asarray(rng.standard_normal(mesh0.num_nodes))
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(mesh0.node_flags != 0))
    hier = build_amg(A, coarse_n=300, aggregation="greedy", strength=0.08)
    res = cg(A.matvec, b, tol=1e-8, maxiter=100, M=hier.apply)
    assert bool(res.converged)
    assert int(res.iterations) <= 15, int(res.iterations)


def test_interval_amg_on_p2_system(monkeypatch):
    """AMG is algebraic: it must precondition higher-order (P2) systems
    too — wider stencils (K=24), edge DOFs interleaved with vertex DOFs.
    RCM + interval-W on the P2 Poisson operator converges in ~82
    iterations at 6.5k DOFs (weaker than P1's ~24: P2's coupling reaches
    across the fixed index window; greedy aggregation is the
    better-converging choice for high-order operators when its gather
    transfers are affordable).  (Gather matvec forced: iteration counts
    are backend-independent.)"""
    import tpufem.sparse.ell as ell_mod
    monkeypatch.setattr(ell_mod, "_AUTO_BAND_MAX", -1)
    # _AUTO_BAND_MAX=-1 alone flips build_amg's wide-band priming branch
    # (bw_l > -1 is always true) into priming EVERY level through the
    # interpreted Pallas kernel; TPUFEM_BAND_DISPATCH=0 is honored by both
    # the auto-dispatch and the priming branch, keeping this on gather SpMV.
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    import jax.numpy as jnp
    from tpufem.fem.space import FunctionSpace
    from tpufem.forms.language import SpatialCoordinate, dot, grad
    from tpufem.forms.weakform import WeakForm
    from tpufem.mesh.rectangle import rectangle_mesh
    from tpufem.sparse.ell import ELLMatrix, reorder_ell

    mesh = rectangle_mesh(-3, 3, -3, 3, 40, 40)
    V = FunctionSpace(mesh, degree=2)
    X = SpatialCoordinate(V)
    f = 36 - 2 * (X[0] ** 2 + X[1] ** 2)
    wf = WeakForm(V).build(lambda u, v: dot(grad(u), grad(v)),
                           lambda v: f * v)
    A, b = wf.assemble(format="ell")
    A, b = apply_dirichlet_ell(A, b, jnp.asarray(V.dof_flags))

    perm = reverse_cuthill_mckee(np.asarray(A.cols))
    data_p, cols_p = reorder_ell(np.asarray(A.data), np.asarray(A.cols),
                                 perm)
    Ap = ELLMatrix(jnp.asarray(data_p), jnp.asarray(cols_p))
    bp = jnp.asarray(np.asarray(b)[perm])

    hier = build_amg(Ap, aggregation="interval", cycle="W", coarse_n=300)
    res = cg(Ap.matvec, bp, tol=1e-9, maxiter=150, M=hier.apply)
    assert bool(res.converged)
    assert int(res.iterations) <= 120, int(res.iterations)

    ref = cg(Ap.matvec, bp, tol=1e-12, maxiter=20000)
    assert bool(ref.converged)
    scale = float(np.abs(np.asarray(ref.x)).max())
    assert np.abs(np.asarray(res.x) - np.asarray(ref.x)).max() < 1e-6 * scale


def test_build_amg_resolves_band_plans_at_setup(monkeypatch):
    """Every hierarchy matrix must leave build_amg with its banded plan
    RESOLVED (round-4 hardware regression): the hierarchy crosses jit
    boundaries as a pytree argument, where cols are tracers and the lazy
    auto-dispatch can no longer measure the bandwidth — an unresolved
    matrix then silently rides the ~500x-slower gather inside every
    cycle (measured: 472 ms/V-cycle at 1M rows vs ~1.5 ms of banded
    work, /tmp/amg_ab_r4.log phase5b).  Simulated TPU backend: plan
    CONSTRUCTION is host-side and backend-independent; nothing here
    executes a kernel."""
    import jax

    import tpufem.solve.amg as amg_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    _, A, b, _ = _system(40)

    hb = build_amg(A, coarse_n=120, aggregation="greedy",
                   transfer="banded", strength=0.08)
    for lv in hb.levels:
        assert isinstance(lv.A._band, tuple), "level operator unresolved"
        assert isinstance(lv.Qp._band, tuple), "embedded P unresolved"
        assert isinstance(lv.Qr._band, tuple), "embedded P^T unresolved"

    hi = build_amg(A, coarse_n=120, aggregation="interval")
    for lv in hi.levels:
        assert isinstance(lv.A._band, tuple)
        if lv.Rop is not None:
            assert isinstance(lv.Rop._band, tuple)
            assert isinstance(lv.Pop._band, tuple)

    # TPUFEM_BAND_DISPATCH=0 still pins everything to the gather (fresh
    # matrix: the builds above resolved and cached A's own plan in place)
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    from tpufem.sparse.ell import ELLMatrix
    A0 = ELLMatrix(A.data, A.cols)
    hg = build_amg(A0, coarse_n=120, aggregation="greedy",
                   transfer="banded")
    for lv in hg.levels:
        assert lv.A._band in (None, "unresolved")
        assert lv.Qp._band in (None, "unresolved")
