"""Mixed-precision iterative refinement: fp32 inner solves, fp64 residuals.

BASELINE.md's north-star metric is "CG time-to-1e-8 residual", but fp32
cannot reliably reach 1e-8 (unit roundoff ~6e-8, and the MXU further
truncates fp32 matmul inputs to bf16 unless forced).  The TPU-native answer
is classical iterative refinement:

    repeat:  r = b - A x          (fp64 — XLA emulates f64 on TPU; only a
                                   couple of matvecs + norms per outer step)
             solve A d ~= r       (fp32 MG-PCG, all the fast Pallas kernels)
             x <- x + d           (fp64 accumulate)

Each outer step multiplies the residual by the inner solve's reduction
factor (~1e-5 for 10 MG-PCG iterations), so 2 outer steps reach 1e-8 and 3
reach fp64 roundoff.  The entire loop — including the fp64 residuals — runs
on-device inside one jitted lax.while_loop; no host round-trips.

The reference has no solver at all (SURVEY.md §0); its only fp64 story is an
atomicCAS emulation for pre-Pascal GPUs (/root/reference/atomicadd.cu:110-129).

Requires ``jax.config.update("jax_enable_x64", True)``.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["RefinedResult", "iterative_refinement", "refined_stencil_solve"]


class RefinedResult(NamedTuple):
    x: jax.Array               # fp64 iterate
    residual_norm: jax.Array   # fp64 ||b - A x|| / ||b||
    outer_iterations: jax.Array   # int32
    converged: jax.Array


def _require_x64():
    if not jax.config.read("jax_enable_x64"):
        raise RuntimeError(
            "iterative refinement needs fp64 accumulation: call "
            "jax.config.update('jax_enable_x64', True) before tracing")


def iterative_refinement(matvec_hi: Callable, inner_solve: Callable, b, *,
                         tol: float = 1e-8,
                         max_outer: int = 8) -> RefinedResult:
    """Solve A x = b to ``tol`` relative fp64 residual.

    matvec_hi:    x64 -> A x in fp64 (the high-precision operator).
    inner_solve:  r32 -> approximate A^-1 r32 in fp32 (e.g. a fixed-iteration
                  MG-PCG via :func:`tpufem.solve.cg.cg_fixed`).
    b:            right-hand side (cast to fp64).

    The residual is rescaled to O(1) before each inner solve so fp32 never
    under/overflows as r shrinks toward 1e-16 * ||b||.
    """
    _require_x64()
    b = jnp.asarray(b, jnp.float64)
    bnorm = jnp.linalg.norm(b)
    safe = jnp.where(bnorm > 0, bnorm, 1.0)

    def cond(state):
        _, _, rn, k = state
        return (rn > tol) & (k < max_outer)

    def body(state):
        x, r, rn, k = state
        s = jnp.max(jnp.abs(r))
        s = jnp.where(s > 0, s, 1.0)
        d32 = inner_solve((r / s).astype(jnp.float32))
        x = x + s * d32.astype(jnp.float64)
        r = b - matvec_hi(x)
        rn = jnp.linalg.norm(r) / safe
        return (x, r, rn, k + 1)

    x0 = jnp.zeros_like(b)
    init = (x0, b, bnorm / safe, jnp.int32(0))
    x, _, rn, k = jax.lax.while_loop(cond, body, init)
    return RefinedResult(x=x, residual_norm=rn, outer_iterations=k,
                         converged=rn <= tol)


def refined_stencil_solve(data32, data64, offsets, b, precond, *,
                          tol: float = 1e-8, inner_iters: int = 10,
                          max_outer: int = 8,
                          matvec32: Callable | None = None,
                          matvec_dot32: Callable | None = None,
                          M_dot: Callable | None = None) -> RefinedResult:
    """Refinement specialized to embedded stencil systems.

    data32/data64: stencil values [K, NS] in fp32 (inner) / fp64 (residual).
    precond:       fp32 preconditioner (e.g. the MG V-cycle).
    matvec32:      optional fast fp32 matvec (e.g. the Pallas kernel);
                   defaults to the XLA shifted-add path.
    matvec_dot32 / M_dot: optional fused-dot hooks for the inner cg_fixed
                   (see tpufem.solve.cg).

    The fp64 matvec always uses the XLA path — Mosaic has no f64, and two
    shifted-add passes per outer step are a rounding error next to the inner
    MG-PCG work.
    """
    from tpufem.solve.cg import cg_fixed
    from tpufem.sparse.stencil import stencil_matvec

    _require_x64()
    offsets = tuple(int(o) for o in offsets)
    if matvec32 is None:
        matvec32 = lambda v: stencil_matvec(data32, offsets, v)

    def matvec_hi(v):
        return stencil_matvec(data64, offsets, v)

    def inner(r32):
        x, _ = cg_fixed(matvec32, r32, jnp.int32(inner_iters), M=precond,
                        matvec_dot=matvec_dot32, M_dot=M_dot)
        return x

    return iterative_refinement(matvec_hi, inner, b, tol=tol,
                                max_outer=max_outer)
