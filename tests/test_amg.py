"""Smoothed-aggregation AMG, structural half (VERDICT.md r2 item 5).

Checks: (a) native/numpy aggregation parity and partition sanity; (b) the
Galerkin coarse operator equals the dense P^T A P; (c) the V-/W-cycles are
symmetric positive definite operators (hard PCG requirement); (d) matrix-
free interval transfers match the explicit prolongator; (e) the banded-
embedded transfer path is bit-compatible with the gather path; (f) every
hierarchy matrix leaves ``build_amg`` with its banded plan resolved (the
round-4 silent-gather regression).

The convergence/scaling half (mesh-independence sweeps, P2/anisotropic/3D
robustness) lives in ``test_amg_scaling.py`` — split so neither file
dominates the suite wall (VERDICT r4 weak #8; the combined file was 642 s
on the 1-core box).  Shared systems are cached in ``amg_systems.py``.
"""
import numpy as np

import jax.numpy as jnp

from amg_systems import p1_system as _system
from tpufem.solve.cg import cg
from tpufem.solve.amg import build_amg, greedy_aggregate


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
    import jax
    _, A, _, _ = _system(12)
    hier = build_amg(A, coarse_n=30)
    n = A.shape[0]
    ap = jax.jit(hier.apply)   # one trace; eager per-column is CPU-minutes
    cols = [np.asarray(ap(jnp.zeros(n, A.dtype).at[i].set(1.0)))
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


def test_apply_multi_matches_columnwise():
    """The multi-RHS cycle (hier.apply_multi) must equal the scalar cycle
    applied column-by-column, for every transfer mode — it is the SAME
    linear operator, only the matrix-streaming is batched.  This is the
    operator eigen's batched inner solves use as M_multi; any drift here
    silently breaks the lockstep CG chains' preconditioning."""
    import jax
    _, A, _, _ = _system(16)
    n = A.shape[0]
    rng = np.random.default_rng(3)
    R = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))
    for kw in (dict(aggregation="greedy", transfer="banded",
                    strength=0.08),
               dict(aggregation="greedy", transfer="gather"),
               dict(aggregation="interval", interval_size=6),
               dict(aggregation="interval", interval_size=6, cycle="W")):
        hier = build_amg(A, coarse_n=30, **kw)
        Zm = np.asarray(jax.jit(hier.apply_multi)(R))
        ap = jax.jit(hier.apply)
        Zc = np.stack([np.asarray(ap(R[:, j])) for j in range(5)], axis=1)
        assert np.abs(Zm - Zc).max() < 1e-5 * np.abs(Zc).max() + 1e-7, kw


def test_boundary_singletons_merge_and_stay_banded():
    """Dirichlet rows are decoupled singletons under greedy aggregation
    and must (a) be merged so the hierarchy's coarsest stays small
    (pre-fix: the 491k-DOF coarsest was 2833 rows of which 2800 were
    boundary — BENCH_NOTES r5 phase E3), and (b) be merged SPAN-CAPPED:
    boundary rows are ~bandwidth-spaced along the RCM order, so an
    unbounded group makes the embedded restriction's bandwidth explode
    (hardware: single-block kernels + 147 MB of register spills at 491k
    rows, phase F2)."""
    _, A, _, _ = _system(64)
    n = A.shape[0]
    cols0 = np.asarray(A.cols)
    bw0 = int(np.abs(cols0.astype(np.int64) - np.arange(n)[:, None]).max())
    hier = build_amg(A, coarse_n=60, strength=0.08)
    # boundary rows: 4*64 = 256; without the merge the coarsest cannot
    # go below them, with it the hierarchy must coarsen past them
    assert hier.coarse_inv.shape[0] < 200, hier.coarse_inv.shape
    for lv in hier.levels:
        for Q in (lv.Qp, lv.Qr):
            if Q is None:
                continue
            qc = np.asarray(Q.cols)
            nn = qc.shape[0]
            qbw = int(np.abs(qc.astype(np.int64)
                             - np.arange(nn)[:, None]).max())
            assert qbw <= max(4 * bw0, 4096), (nn, qbw, bw0)
