"""Smoothed-aggregation AMG, convergence/scaling half.

Mesh-independence sweeps and operator-robustness checks (P2, anisotropic,
3D tet): the property Chebyshev-Jacobi lacks and the reason AMG exists.
Split from ``test_amg.py`` (structural half) so neither file dominates
the suite wall — VERDICT r4 weak #8; the combined file was 642 s on the
1-core box.  Shared systems are cached in ``amg_systems.py``.

Iteration counts are matvec-backend-independent, so every test here
forces the gather SpMV (``TPUFEM_BAND_DISPATCH=0``): the interpret-mode
banded kernel at n=160 costs ~7 CPU-minutes and its numerics are covered
by the parity tests in the structural half.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from amg_systems import p1_system as _system, p2_system as _p2_system
from tpufem.solve.amg import build_amg
from tpufem.solve.cg import cg


def test_interval_wcycle_amg_pcg_bounded_iteration_growth(monkeypatch):
    """interval aggregation is 1D semicoarsening along the RCM line, so a
    V-cycle's iteration count grows with the mesh (21 -> 49 over a 16x row
    increase); the W-cycle (gamma=2) bounds the growth (21 -> 38 measured)
    while every transfer stays gather-free.  Greedy aggregation (tested
    below) stays flat but pays gather transfers per cycle — at 1M rows the
    gathers cost ~40x the whole interval W-cycle (BENCH_NOTES r3).
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
    from tpufem.mesh.adjacency import reverse_cuthill_mckee
    from tpufem.solve.bc import apply_dirichlet_ell

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
    from tpufem.assemble.ell import assemble_ell
    from tpufem.assemble.local import p1_stiffness
    from tpufem.fem.elements import P1Tetrahedron
    from tpufem.mesh.adjacency import ell_pattern, reverse_cuthill_mckee
    from tpufem.mesh.box import box_mesh
    from tpufem.mesh.core import Mesh
    from tpufem.solve.bc import apply_dirichlet_ell

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
    monkeypatch.setenv("TPUFEM_BAND_DISPATCH", "0")

    Ap, bp = _p2_system(40)

    hier = build_amg(Ap, aggregation="interval", cycle="W", coarse_n=300)
    res = cg(Ap.matvec, bp, tol=1e-9, maxiter=150, M=hier.apply)
    assert bool(res.converged)
    assert int(res.iterations) <= 120, int(res.iterations)

    # reference: dense fp64 direct solve (6.5k DOFs) — replaces the old
    # 20000-iteration unpreconditioned CG reference, identical bar at a
    # fraction of the CPU wall
    Ad = np.asarray(Ap.to_dense(), np.float64)
    xd = np.linalg.solve(Ad, np.asarray(bp, np.float64))
    scale = float(np.abs(xd).max())
    assert np.abs(np.asarray(res.x) - xd).max() < 1e-6 * scale
