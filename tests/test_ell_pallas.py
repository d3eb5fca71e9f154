"""Banded Pallas ELL SpMV + RCM ordering (VERDICT item 6).

Exactness is checked in interpret mode against the XLA gather matvec
(sparse/ell.py); the reference kernel being replaced is the search+atomicAdd
ELL SpMV at /root/reference/fea_test_sm_sym_sparse2.cu:273-282.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
from tpufem.mesh.rectangle import perturbed_rectangle_mesh, rectangle_mesh
from tpufem.sparse.ell import ell_matvec, reorder_ell
from tpufem.sparse.ell_pallas import ell_band_plan, ell_matvec_pallas


def _random_banded(rng, n, k, band):
    cols = np.clip(np.arange(n)[:, None]
                   + rng.integers(-band, band + 1, size=(n, k)),
                   0, n - 1).astype(np.int32)
    data = rng.standard_normal((n, k)).astype(np.float32)
    return data, cols


@pytest.mark.parametrize("n,k,band,R", [(5000, 8, 300, 1024),
                                        (3000, 16, 900, 1024),
                                        (900, 8, 64, 128)])
def test_pallas_ell_matches_gather(n, k, band, R):
    rng = np.random.default_rng(0)
    data, cols = _random_banded(rng, n, k, band)
    x = rng.standard_normal(n).astype(np.float32)
    plan = ell_band_plan(data, cols, block_rows=R)
    y = ell_matvec_pallas(plan, jnp.asarray(plan.data_t),
                          jnp.asarray(plan.rel), jnp.asarray(x),
                          interpret=True)
    ref = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(cols),
                                jnp.asarray(x)))
    err = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert err < 1e-6, err


def test_bandwidth_check_raises():
    rng = np.random.default_rng(1)
    data, cols = _random_banded(rng, 4000, 4, 2000, )
    with pytest.raises(ValueError, match="bandwidth"):
        ell_band_plan(data, cols, block_rows=1024)


def test_rcm_is_permutation_and_shrinks_bandwidth():
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, 60, 60, jitter=0.25,
                                    seed=0)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    perm = reverse_cuthill_mckee(pat.cols)
    assert sorted(perm.tolist()) == list(range(mesh.num_nodes))
    _, cols_p = reorder_ell(np.ones(pat.cols.shape, np.float32), pat.cols,
                            perm)
    rows = np.arange(mesh.num_nodes)[:, None]
    bw0 = np.abs(pat.cols.astype(np.int64) - rows).max()
    bw1 = np.abs(cols_p.astype(np.int64) - rows).max()
    # the perturbed generator scrambles numbering: bw0 ~ N; RCM restores
    # a ~one-mesh-line band
    assert bw1 < 90
    assert bw1 < bw0 // 10


def test_rcm_disconnected_components():
    # two independent paths: 0-1-2 and 3-4
    cols = np.array([[0, 1], [0, 2], [1, 2], [3, 4], [3, 4]],
                    dtype=np.int32)
    perm = reverse_cuthill_mckee(cols)
    assert sorted(perm.tolist()) == [0, 1, 2, 3, 4]


def test_reorder_ell_matvec_equivariance():
    rng = np.random.default_rng(2)
    mesh = rectangle_mesh(-3, 3, -3, 3, 20, 20)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    data = rng.standard_normal(pat.cols.shape).astype(np.float64)
    x = rng.standard_normal(mesh.num_nodes)
    perm = reverse_cuthill_mckee(pat.cols)
    d2, c2 = reorder_ell(data, pat.cols, perm)
    y = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(pat.cols),
                              jnp.asarray(x)))
    y2 = np.asarray(ell_matvec(jnp.asarray(d2), jnp.asarray(c2),
                               jnp.asarray(x[perm])))
    assert np.abs(y2 - y[perm]).max() < 1e-12


def test_solve_poisson_ell_pallas_path():
    """Full unstructured solve through the banded Pallas SpMV (interpret)
    matches the gather path and the exact solution."""
    from tpufem.solve.poisson import model_problem_2d, solve_poisson_ell

    f, exact = model_problem_2d()
    mesh = perturbed_rectangle_mesh(-3, 3, -3, 3, 24, 24, jitter=0.2,
                                    seed=1)
    ref = solve_poisson_ell(mesh, f, dtype=jnp.float32, tol=1e-7,
                            maxiter=2000)
    sol = solve_poisson_ell(mesh, f, dtype=jnp.float32, tol=1e-7,
                            maxiter=2000, matvec="pallas", block_rows=128,
                            interpret=True)
    assert bool(sol.cg.converged)
    du = np.abs(np.asarray(sol.u) - np.asarray(ref.u)).max()
    assert du < 1e-4, du
    ue = exact(mesh.coords)
    err = (np.sqrt(np.mean((np.asarray(sol.u) - ue) ** 2))
           / np.sqrt(np.mean(ue ** 2)))
    assert err < 5e-3, err


def test_bcsr_pallas_matches_gather():
    """Banded block (BCSR) kernel vs the gather matvec, interpret mode."""
    from tpufem.sparse.bcsr import BCSRMatrix
    from tpufem.sparse.ell_pallas import bcsr_band_plan, bcsr_matvec_pallas

    rng = np.random.default_rng(3)
    nr, k, band, b = 2000, 8, 200, 3
    cols = np.clip(np.arange(nr)[:, None]
                   + rng.integers(-band, band + 1, size=(nr, k)),
                   0, nr - 1).astype(np.int32)
    data = rng.standard_normal((nr, k, b, b)).astype(np.float32)
    x = rng.standard_normal((b, nr)).astype(np.float32)
    plan, data_t = bcsr_band_plan(data, cols, block_rows=512)
    y = bcsr_matvec_pallas(plan, jnp.asarray(data_t), jnp.asarray(plan.rel),
                           jnp.asarray(x), interpret=True)
    A = BCSRMatrix(jnp.asarray(data), jnp.asarray(cols))
    ref = np.asarray(A.matvec(
        jnp.asarray(np.ascontiguousarray(x.T.reshape(-1)))))
    ref = ref.reshape(nr, b).T
    err = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_ellmatrix_auto_dispatches_banded(monkeypatch):
    """matvec must auto-use the banded Pallas plan when bandwidth allows
    (VERDICT.md r2 item 8) and match the gather path exactly."""
    from tpufem.sparse import ell as ell_mod
    from tpufem.sparse.ell import ELLMatrix

    rng = np.random.default_rng(3)
    data, cols = _random_banded(rng, 2000, 8, 200)
    x = jnp.asarray(rng.standard_normal(2000).astype(np.float32))
    A = ELLMatrix(jnp.asarray(data), jnp.asarray(cols))

    calls = {"pallas": 0}
    import tpufem.sparse.ell_pallas as ep
    real = ep.ell_matvec_pallas

    def spy(*a, **kw):
        calls["pallas"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ep, "ell_matvec_pallas", spy)
    y = A.matvec(x)
    assert calls["pallas"] == 1, "banded matrix did not dispatch to Pallas"
    assert A._band not in (None, "unresolved")
    ref = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(cols), x))
    err = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert err < 1e-6, err
    # plan is cached: second call does not rebuild
    plan0 = A._band[0]
    A.matvec(x)
    assert A._band[0] is plan0


def test_ellmatrix_wide_band_falls_back_to_gather():
    from tpufem.sparse.ell import ELLMatrix, _AUTO_BAND_MAX

    rng = np.random.default_rng(4)
    n = 2 * _AUTO_BAND_MAX + 600
    data, cols = _random_banded(rng, n, 4, _AUTO_BAND_MAX + 300)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    A = ELLMatrix(jnp.asarray(data), jnp.asarray(cols))
    y = A.matvec(x)
    assert A._band is None   # resolved to "no plan"
    ref = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(cols), x))
    assert np.allclose(np.asarray(y), ref, rtol=1e-6, atol=1e-6)


def test_ellmatrix_dispatch_inside_jit_closure():
    """The usual solve pattern: concrete A captured by closure, jitted fn
    maps tracer x through A.matvec -> must still hit the Pallas path."""
    import jax as _jax
    from tpufem.sparse.ell import ELLMatrix

    rng = np.random.default_rng(5)
    data, cols = _random_banded(rng, 1500, 8, 120)
    A = ELLMatrix(jnp.asarray(data), jnp.asarray(cols))
    x = jnp.asarray(rng.standard_normal(1500).astype(np.float32))
    y = _jax.jit(lambda v: A.matvec(v))(x)
    assert A._band not in (None, "unresolved")
    ref = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(cols), x))
    err = np.abs(np.asarray(y) - ref).max() / np.abs(ref).max()
    assert err < 1e-6, err


def test_per_block_delta_kernel_matches_static():
    """The per-block SMEM delta-table kernel (plan.dtab) must be bit-exact
    vs the static global-union kernel on the same plan."""
    rng = np.random.default_rng(7)
    data, cols = _random_banded(rng, 6000, 8, 700, )
    x = rng.standard_normal(6000).astype(np.float32)
    plan = ell_band_plan(data, cols, block_rows=1024, per_block=True)
    assert plan.dtab is not None
    # the table must cover fewer rounds per block than the global union
    dmax = plan.dtab.shape[2]
    assert dmax <= max(len(d) for d in plan.d_lists)
    args = (jnp.asarray(plan.data_t), jnp.asarray(plan.rel), jnp.asarray(x))
    y_pb = ell_matvec_pallas(plan, *args, interpret=True, per_block=True)
    y_st = ell_matvec_pallas(plan, *args, interpret=True, per_block=False)
    # the kernels accumulate their gather rounds in different orders, so
    # agreement is to fp32 roundoff, not bit-exact
    np.testing.assert_allclose(np.asarray(y_pb), np.asarray(y_st),
                               rtol=1e-5, atol=1e-6)


def test_plan_without_table_dispatches_static():
    rng = np.random.default_rng(8)
    data, cols = _random_banded(rng, 2000, 8, 200, )
    x = rng.standard_normal(2000).astype(np.float32)
    plan = ell_band_plan(data, cols, block_rows=512, per_block=False)
    assert plan.dtab is None
    y = ell_matvec_pallas(plan, jnp.asarray(plan.data_t),
                          jnp.asarray(plan.rel), jnp.asarray(x),
                          interpret=True)
    ref = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(cols),
                                jnp.asarray(x)))
    assert np.abs(np.asarray(y) - ref).max() / np.abs(ref).max() < 1e-6


def test_bcsr_per_block_matches_static():
    """Per-block delta BCSR kernel vs the static-union kernel."""
    from tpufem.sparse.ell_pallas import bcsr_band_plan, bcsr_matvec_pallas
    rng = np.random.default_rng(11)
    nr, K, b, band = 2000, 8, 3, 300
    cols = np.clip(np.arange(nr)[:, None]
                   + rng.integers(-band, band + 1, size=(nr, K)),
                   0, nr - 1).astype(np.int32)
    data = rng.standard_normal((nr, K, b, b)).astype(np.float32)
    x = rng.standard_normal((b, nr)).astype(np.float32)
    plan, data_t = bcsr_band_plan(data, cols, block_rows=512,
                                  per_block=True)
    assert plan.dtab is not None
    args = (jnp.asarray(data_t), jnp.asarray(plan.rel), jnp.asarray(x))
    y_pb = bcsr_matvec_pallas(plan, *args, interpret=True, per_block=True)
    y_st = bcsr_matvec_pallas(plan, *args, interpret=True, per_block=False)
    np.testing.assert_allclose(np.asarray(y_pb), np.asarray(y_st),
                               rtol=1e-5, atol=1e-5)


def test_segmented_kernel_matches_global_and_gather():
    """Contiguous-segment static specialization: parity vs the global
    static kernel and the gather reference."""
    rng = np.random.default_rng(13)
    n, k = 40000, 8
    # drifting bandwidth (RCM-like): neighbor offsets grow along the range
    rows = np.arange(n)
    band = (80 + rows // 200).astype(np.int64)           # 80 -> 280
    cols = np.clip(rows[:, None]
                   + rng.integers(-1, 2, size=(n, k)) * band[:, None]
                   + rng.integers(-3, 4, size=(n, k)),
                   0, n - 1).astype(np.int32)
    data = rng.standard_normal((n, k)).astype(np.float32)
    x = rng.standard_normal(n).astype(np.float32)
    plan = ell_band_plan(data, cols, block_rows=512)
    assert plan.segments is not None and len(plan.segments) > 1
    # segments cover the block range exactly once
    nb = plan.np_rows // plan.block_rows
    covered = [seg for seg in plan.segments]
    assert covered[0][0] == 0 and covered[-1][1] == nb
    for (s0, e0, _), (s1, e1, _) in zip(covered, covered[1:]):
        assert e0 == s1
    # each segment's rounds <= the global union
    g = sum(len(d) for d in plan.d_lists)
    assert all(sum(len(d) for d in dl) <= g for _, _, dl in covered)

    args = (jnp.asarray(plan.data_t), jnp.asarray(plan.rel), jnp.asarray(x))
    y_seg = ell_matvec_pallas(plan, *args, interpret=True)
    y_glob = ell_matvec_pallas(plan, *args, interpret=True, segmented=False)
    np.testing.assert_allclose(np.asarray(y_seg), np.asarray(y_glob),
                               rtol=1e-5, atol=1e-6)
    ref = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(cols),
                                jnp.asarray(x)))
    err = np.abs(np.asarray(y_seg) - ref).max() / np.abs(ref).max()
    assert err < 1e-5, err


def test_band_dispatch_env_escape(monkeypatch):
    """TPUFEM_BAND_DISPATCH=0 forces the gather path (CPU benchmarking
    escape; on non-TPU backends the banded kernel runs interpreted)."""
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")
    from tpufem.sparse.ell import ELLMatrix

    rng = np.random.default_rng(5)
    data, cols = _random_banded(rng, 1500, 6, 100)
    A = ELLMatrix(jnp.asarray(data), jnp.asarray(cols))
    x = jnp.asarray(rng.standard_normal(1500))
    y = np.asarray(A.matvec(x))
    assert A._band is None          # declined the plan, rode the gather
    ref = np.asarray(ell_matvec(jnp.asarray(data), jnp.asarray(cols), x))
    np.testing.assert_allclose(y, ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("n,k,band,R,q", [(5000, 8, 300, 1024, 5),
                                          (900, 8, 64, 128, 3)])
def test_pallas_ell_multi_matches_gather(n, k, band, R, q):
    """Multi-RHS banded kernel == gather multi-RHS (interpret mode)."""
    from tpufem.sparse.ell import ell_matvec_multi
    from tpufem.sparse.ell_pallas import ell_matvec_pallas_multi
    rng = np.random.default_rng(7)
    data, cols = _random_banded(rng, n, k, band)
    X = rng.standard_normal((n, q)).astype(np.float32)
    plan = ell_band_plan(data, cols, block_rows=R)
    Y = ell_matvec_pallas_multi(plan, jnp.asarray(plan.data_t),
                                jnp.asarray(plan.rel), jnp.asarray(X),
                                interpret=True)
    ref = np.asarray(ell_matvec_multi(jnp.asarray(data),
                                      jnp.asarray(cols), jnp.asarray(X)))
    assert Y.shape == (n, q)
    err = np.abs(np.asarray(Y) - ref).max() / np.abs(ref).max()
    assert err < 1e-6, err


def test_pallas_ell_multi_segmented_matches_global():
    """Segmented multi-RHS variant == unsegmented == gather."""
    from tpufem.sparse.ell import ell_matvec_multi
    from tpufem.sparse.ell_pallas import ell_matvec_pallas_multi
    mesh = perturbed_rectangle_mesh(-1, 1, -1, 1, 40, 40, jitter=0.2,
                                    seed=2)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    perm = reverse_cuthill_mckee(pat.cols)
    rng = np.random.default_rng(3)
    data = rng.standard_normal(pat.cols.shape).astype(np.float32)
    data_p, cols_p = reorder_ell(data, pat.cols, perm)
    plan = ell_band_plan(data_p, cols_p, block_rows=128, segment=True)
    X = rng.standard_normal((mesh.num_nodes, 4)).astype(np.float32)
    dt, rl, Xj = (jnp.asarray(plan.data_t), jnp.asarray(plan.rel),
                  jnp.asarray(X))
    Y_seg = ell_matvec_pallas_multi(plan, dt, rl, Xj, interpret=True,
                                    segmented=True)
    Y_glob = ell_matvec_pallas_multi(plan, dt, rl, Xj, interpret=True,
                                     segmented=False)
    ref = np.asarray(ell_matvec_multi(jnp.asarray(data_p),
                                      jnp.asarray(cols_p), Xj))
    for Y in (Y_seg, Y_glob):
        err = np.abs(np.asarray(Y) - ref).max() / np.abs(ref).max()
        assert err < 1e-6, err


def test_ellmatrix_matvec_multi_matches_columns():
    """ELLMatrix.matvec_multi (banded auto-dispatch) == per-column
    matvec, and the gather fallback path agrees too."""
    import jax
    from tpufem.sparse.ell import ELLMatrix
    mesh = rectangle_mesh(-1, 1, -1, 1, 30, 30)
    pat = ell_pattern(mesh.conn, mesh.num_nodes, pad_to=8)
    rng = np.random.default_rng(5)
    data = rng.standard_normal(pat.cols.shape).astype(np.float32)
    A = ELLMatrix(jnp.asarray(data), jnp.asarray(pat.cols))
    X = jnp.asarray(rng.standard_normal((mesh.num_nodes, 3))
                    .astype(np.float32))
    Y = np.asarray(A.matvec_multi(X))
    cols = np.stack([np.asarray(A.matvec(X[:, j])) for j in range(3)],
                    axis=1)
    err = np.abs(Y - cols).max() / np.abs(cols).max()
    assert err < 1e-5, err
