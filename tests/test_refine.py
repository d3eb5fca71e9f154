"""Mixed-precision iterative refinement reaches 1e-8+ (BASELINE north-star).

fp32 alone bottoms out near 1e-6 relative residual; the refinement loop
(fp32 inner MG-PCG + fp64 residual/accumulate) must push far below 1e-8.
"""
import numpy as np

import jax
import jax.numpy as jnp

from tpufem.solve.cg import cg_fixed
from tpufem.solve.multigrid import build_poisson_multigrid, mg_preconditioner
from tpufem.solve.refine import iterative_refinement, refined_stencil_solve
from tpufem.sparse.stencil import stencil_matvec


def test_iterative_refinement_dense():
    """Generic IR on a small SPD dense system: fp64 roundoff-level residual."""
    rng = np.random.default_rng(0)
    n = 64
    Q = rng.standard_normal((n, n))
    A = Q @ Q.T + n * np.eye(n)
    A64 = jnp.asarray(A, jnp.float64)
    A32 = jnp.asarray(A, jnp.float32)
    x_true = jnp.asarray(rng.standard_normal(n), jnp.float64)
    b = A64 @ x_true

    inv_d32 = 1.0 / jnp.diag(A32)

    def inner(r32):
        x, _ = cg_fixed(lambda v: A32 @ v, r32, jnp.int32(30),
                        M=lambda r: r * inv_d32)
        return x

    res = iterative_refinement(lambda v: A64 @ v, inner, b, tol=1e-12,
                               max_outer=10)
    assert bool(res.converged)
    assert float(res.residual_norm) < 1e-12
    err = float(jnp.linalg.norm(res.x - x_true) / jnp.linalg.norm(x_true))
    assert err < 1e-11


def test_refined_stencil_solve_reaches_1e8():
    """3D Poisson stencil system: fp32 MG-PCG inner, fp64 residual <= 1e-8."""
    n = 16
    levels64 = build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=jnp.float64,
                                       coarse_max=4)
    lv = levels64[0]
    data64 = lv.data
    data32 = data64.astype(jnp.float32)
    levels32 = build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=jnp.float32,
                                       coarse_max=4)
    precond = mg_preconditioner(levels32, nu1=1, nu2=1, use_pallas=False)

    rng = np.random.default_rng(1)
    xt_nodes = rng.standard_normal(int(np.prod(lv.plan.info.node_grid)))
    x_true = lv.plan.embed_field(jnp.asarray(xt_nodes, jnp.float64))
    x_true = jnp.where(lv.bc_mask, 0.0, x_true)
    b = stencil_matvec(data64, lv.plan.offsets, x_true)

    res = refined_stencil_solve(data32, data64, lv.plan.offsets, b, precond,
                                tol=1e-9, inner_iters=12, max_outer=8)
    assert bool(res.converged), float(res.residual_norm)
    assert float(res.residual_norm) < 1e-9
    err = float(jnp.linalg.norm(res.x - x_true)
                / jnp.linalg.norm(x_true))
    assert err < 1e-7
    # and it genuinely needed mixed precision: the same work in pure fp32
    # stalls well above the target
    b32 = b.astype(jnp.float32)
    x32, r32 = cg_fixed(lambda v: stencil_matvec(data32, lv.plan.offsets, v),
                        b32, jnp.int32(12 * int(res.outer_iterations)),
                        M=precond)
    rel32 = float(jnp.linalg.norm(b32 - stencil_matvec(
        data32, lv.plan.offsets, x32)) / jnp.linalg.norm(b32))
    assert rel32 > 1e-8


def test_refinement_jits_whole_loop():
    """The full refinement (incl. fp64 residuals) traces under one jit."""
    n = 8
    levels = build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=jnp.float64,
                                     coarse_max=4)
    lv = levels[0]
    data64 = lv.data
    data32 = data64.astype(jnp.float32)
    levels32 = build_poisson_multigrid((-3.0, 3.0), n, 3, dtype=jnp.float32,
                                       coarse_max=4)
    precond = mg_preconditioner(levels32, nu1=1, nu2=1, use_pallas=False)
    nn = int(np.prod(lv.plan.info.node_grid))
    ones = lv.plan.embed_field(jnp.ones(nn, jnp.float64))  # 0 on border rows
    b = jnp.where(lv.bc_mask, 0.0, ones)

    @jax.jit
    def solve(d32, d64, b):
        return refined_stencil_solve(d32, d64, lv.plan.offsets, b, precond,
                                     tol=1e-8, inner_iters=10)

    res = solve(data32, data64, b)
    assert bool(res.converged)
    assert float(res.residual_norm) < 1e-8
