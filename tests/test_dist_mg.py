"""Distributed MG-PCG (z-plane shards, shard_map) vs single-device truth.

VERDICT.md item 2: the halo-exchange design realized beyond 1D stripe CG —
distributed V-cycle smoothing/transfers on the 8-device mesh, matching the
single-device solver at >= 1M DOFs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from tpufem.dist.multigrid import (build_dist_hierarchy, grid_stencil_matvec,
                                   mgpcg_dist, put_hierarchy,
                                   solve_poisson_dist)
from tpufem.solve.cg import cg
from tpufem.solve.multigrid import (build_poisson_multigrid,
                                    mg_preconditioner)
from tpufem.sparse.stencil import stencil_matvec


def _mesh8(cpu_devices):
    return Mesh(np.array(cpu_devices[:8]), ("z",))


def _manufactured(levels):
    """(b_nodes, x_true_nodes) consistent with the fine-level operator."""
    fine = levels[0]
    ng = fine.node_grid
    zp = fine.data.shape[1]
    rng = np.random.default_rng(3)
    xt = rng.standard_normal(ng)
    xt = np.where(fine.bc_mask[:ng[0]], 0.0, xt)
    xt_p = np.pad(xt, [(0, zp - ng[0])] + [(0, 0)] * (len(ng) - 1))
    # b = A x_true via the (replicated) grid matvec
    b_p = np.asarray(grid_stencil_matvec(
        jnp.asarray(fine.data), jnp.asarray(xt_p), fine.offsets_grid, None))
    return b_p[:ng[0]], xt


def test_dist_mg_matches_truth_3d(cpu_devices):
    mesh = _mesh8(cpu_devices)
    n = 32
    levels = build_dist_hierarchy((-3.0, 3.0), n, 3, 8, dtype=np.float64)
    assert levels[0].distributed
    assert not levels[-1].distributed
    b, x_true = _manufactured(levels)

    arrs = put_hierarchy(levels, mesh)
    fine = levels[0]
    zp = fine.data.shape[1]
    b_p = np.pad(b, [(0, zp - b.shape[0]), (0, 0), (0, 0)])
    res = mgpcg_dist(levels, arrs, jnp.asarray(b_p), mesh, tol=1e-10,
                     maxiter=100)
    assert bool(res.converged), (float(res.residual_norm),
                                 int(res.iterations))
    x = np.asarray(res.x)[:fine.node_grid[0]]
    err = np.linalg.norm(x - x_true) / np.linalg.norm(x_true)
    assert err < 1e-8, err
    # MG actually working: far fewer iterations than plain Jacobi-CG needs
    assert int(res.iterations) < 30


def test_dist_mg_matches_single_device(cpu_devices):
    """Same system solved by the single-device embedded MG-PCG: solutions
    agree to well below 1e-7."""
    mesh = _mesh8(cpu_devices)
    n = 32
    levels = build_dist_hierarchy((-3.0, 3.0), n, 3, 8, dtype=np.float64)
    b, _ = _manufactured(levels)

    u_dist, res_d = solve_poisson_dist((-3.0, 3.0), n, 3, mesh,
                                       b.reshape(-1), dtype=np.float64,
                                       tol=1e-10, maxiter=100)
    assert bool(res_d.converged)

    # single-device reference: embedded hierarchy + guarded cg
    slevels = build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=jnp.float64,
                                      coarse_max=8)
    lv = slevels[0]
    b_emb = lv.plan.embed_field(jnp.asarray(b.reshape(-1)))
    b_emb = jnp.where(lv.bc_mask, 0.0, b_emb)
    M = mg_preconditioner(slevels, nu1=1, nu2=1, use_pallas=False)
    res_s = cg(lambda v: stencil_matvec(lv.data, lv.plan.offsets, v),
               b_emb, tol=1e-10, maxiter=100, M=M)
    assert bool(res_s.converged)
    u_single = np.asarray(lv.plan.extract_field(res_s.x))

    diff = (np.linalg.norm(u_dist - u_single)
            / max(np.linalg.norm(u_single), 1e-30))
    assert diff < 1e-7, diff


@pytest.mark.slow
def test_dist_mg_million_dofs(cpu_devices):
    """>= 1M DOFs on the 8-device mesh (VERDICT item 2 'Done' criterion)."""
    mesh = _mesh8(cpu_devices)
    n = 104                                   # 105^3 = 1,157,625 DOFs
    levels = build_dist_hierarchy((-3.0, 3.0), n, 3, 8, dtype=np.float64)
    assert sum(lv.distributed for lv in levels) >= 2
    b, x_true = _manufactured(levels)

    u, res = solve_poisson_dist((-3.0, 3.0), n, 3, mesh, b.reshape(-1),
                                dtype=np.float64, tol=1e-9, maxiter=60)
    assert bool(res.converged), (float(res.residual_norm),
                                 int(res.iterations))
    err = (np.linalg.norm(u - x_true.reshape(-1))
           / np.linalg.norm(x_true))
    assert err < 1e-7, err
    assert int(res.iterations) < 30           # MG-grade convergence


def test_dist_mg_2d(cpu_devices):
    """2D variant: y-row stripes, same machinery."""
    mesh = _mesh8(cpu_devices)
    n = 64
    levels = build_dist_hierarchy((-3.0, 3.0), n, 2, 8, dtype=np.float64)
    b, x_true = _manufactured(levels)
    u, res = solve_poisson_dist((-3.0, 3.0), n, 2, mesh, b.reshape(-1),
                                dtype=np.float64, tol=1e-10, maxiter=100)
    assert bool(res.converged)
    err = (np.linalg.norm(u - x_true.reshape(-1))
           / np.linalg.norm(x_true))
    assert err < 1e-8, err


def test_dist_mg_replicated_fallback(cpu_devices):
    """Odd n_cells gives a hierarchy with no distributed level; the solve
    must fall back to the replicated path instead of crashing."""
    mesh = _mesh8(cpu_devices)
    n = 15                                    # sizes=[15]: single level
    levels = build_dist_hierarchy((-3.0, 3.0), n, 3, 8, dtype=np.float64)
    assert not any(lv.distributed for lv in levels)
    b, x_true = _manufactured(levels)
    u, res = solve_poisson_dist((-3.0, 3.0), n, 3, mesh, b.reshape(-1),
                                dtype=np.float64, tol=1e-9, maxiter=200)
    assert bool(res.converged)
    err = (np.linalg.norm(u - x_true.reshape(-1))
           / np.linalg.norm(x_true))
    assert err < 1e-6, err
