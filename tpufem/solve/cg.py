"""(Preconditioned) conjugate gradients, jit-compiled with lax.while_loop.

The reference assembles a stiffness matrix and stops — no solver exists
(SURVEY.md §0).  This CG is the framework's workhorse:

  * operator-agnostic: ``matvec`` may be a dense matmul, an ELL SpMV, a
    Pallas stencil kernel, or a matrix-free element loop;
  * convergence guards (SURVEY.md §5 "failure detection"): NaN/Inf residuals
    terminate with ``diverged=True`` instead of spinning to maxiter;
  * distributed-ready: all reductions are jnp dots, so under shard_map or
    pjit they lower to XLA ``psum`` collectives over ICI automatically.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["CGResult", "cg", "cg_fixed", "cg_fixed_block"]


class CGResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array      # int32
    residual_norm: jax.Array   # final ||r|| / ||b||
    converged: jax.Array       # bool
    diverged: jax.Array        # bool (NaN/Inf detected)


def cg(matvec: Callable, b, x0=None, *, tol: float = 1e-8,
       maxiter: int = 1000, M: Optional[Callable] = None,
       check_every: int = 1, matvec_dot: Optional[Callable] = None,
       M_dot: Optional[Callable] = None) -> CGResult:
    """Solve A x = b with (preconditioned) CG.

    matvec: x -> A x (A symmetric positive definite).
    M:      optional preconditioner application r -> M^-1 r.
    tol:    relative tolerance on ||r||_2 / ||b||_2.

    ``check_every``: iterations per convergence check. The while_loop's
    per-iteration guard costs a device-wide sync; batching k steps per
    check recovers the fixed-iteration loop's pipelining at the price of
    up to k-1 extra iterations past the tolerance (``iterations`` then
    reports the executed count — a multiple of k — and ``maxiter`` may
    overshoot by up to k-1).  Steps past convergence are harmless: CG
    keeps reducing the residual, and the degenerate denominators of a
    fully-converged system (pAp, rz -> 0) are guarded to freeze the
    recurrence instead of producing 0/0.

    ``matvec_dot`` / ``M_dot``: optional fused ``p -> (A p, <p, A p>)`` and
    ``r -> (M^-1 r, <r, M^-1 r>)`` — see :func:`cg_fixed`.

    Supports warm restart: pass ``x0`` (e.g. a checkpointed iterate).
    """
    if M is None:
        M = lambda r: r
    if matvec_dot is None:
        def matvec_dot(p):
            Ap = matvec(p)
            return Ap, jnp.vdot(p, Ap)
    if M_dot is None:
        def M_dot(r):
            z = M(r)
            return z, jnp.vdot(r, z)
    check_every = max(1, int(check_every))

    x0 = jnp.zeros_like(b) if x0 is None else x0
    b_norm = jnp.linalg.norm(b)
    # Guard b == 0: solution is 0, avoid division by zero.
    safe_b_norm = jnp.where(b_norm > 0, b_norm, 1)
    atol = tol * safe_b_norm

    r0 = b - matvec(x0)
    z0, rz0 = M_dot(r0)
    p0 = z0

    def not_done(state):
        _, r, _, _, rz, k, bad = state
        rnorm = jnp.linalg.norm(r)
        return (rnorm > atol) & (k < maxiter) & (~bad)

    def step(state):
        x, r, z, p, rz, k, bad = state
        Ap, pAp = matvec_dot(p)
        alpha = rz / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        z, rz_new = M_dot(r)
        beta = rz_new / rz
        p = z + beta * p
        bad = ~jnp.isfinite(rz_new) | ~jnp.isfinite(pAp) | (pAp <= 0)
        return (x, r, z, p, rz_new, k + 1, bad)

    def step_safe(state):
        # batched-check variant: identical recurrence with guarded scalar
        # divisions, so steps executed past convergence are inert (alpha,
        # beta -> 0 freezes x, r, p) instead of 0/0.  No vector-level
        # where-freezing — that costs 4 extra full passes per iteration
        # and erases the pipelining the batching exists to recover.
        x, r, z, p, rz, k, bad = state
        Ap, pAp = matvec_dot(p)
        alpha = jnp.where(pAp > 0, rz / pAp, 0)
        x = x + alpha * p
        r = r - alpha * Ap
        z, rz_new = M_dot(r)
        beta = jnp.where(rz > 0, rz_new / rz, 0)
        p = z + beta * p
        # pAp == 0 with rz > 0 is the singular-system breakdown (with
        # r = 0 exactly, rz = 0 and the stall is just convergence)
        bad = (bad | ~jnp.isfinite(rz_new) | ~jnp.isfinite(pAp)
               | (pAp < 0) | ((pAp == 0) & (rz > 0)))
        return (x, r, z, p, rz_new, k + 1, bad)

    def batched(state):
        return jax.lax.fori_loop(0, check_every,
                                 lambda i, st: step_safe(st), state)

    init = (x0, r0, z0, p0, rz0, jnp.int32(0), jnp.asarray(False))
    if check_every == 1:
        x, r, _, _, _, k, bad = jax.lax.while_loop(not_done, step, init)
    else:
        x, r, _, _, _, k, bad = jax.lax.while_loop(not_done, batched, init)

    rnorm = jnp.linalg.norm(r) / safe_b_norm
    converged = (rnorm <= tol) & (~bad)
    return CGResult(x=x, iterations=k, residual_norm=rnorm,
                    converged=converged, diverged=bad)


def cg_fixed(matvec: Callable, b, iters, *, M: Optional[Callable] = None,
             x0=None, matvec_dot: Optional[Callable] = None,
             M_dot: Optional[Callable] = None):
    """Fixed-iteration PCG (lax.fori_loop): no convergence checks.

    The guard-free variant of :func:`cg` — the right inner kernel when the
    iteration count is known (timing loops, the inner solve of
    :mod:`tpufem.solve.refine`'s mixed-precision refinement) because the
    fori_loop body carries no reduction-dependent branch, letting XLA
    pipeline iterations back-to-back.  Pass ``iters`` as ``jnp.int32`` so
    changing the count never recompiles.

    ``matvec_dot``: optional fused ``p -> (A p, <p, A p>)`` (e.g.
    ops.stencil_pallas.stencil_matvec_dot_embedded) — saves the separate
    full-field pass a vdot after an opaque kernel costs.  ``M_dot``:
    optional fused ``r -> (M^-1 r, <r, M^-1 r>)`` (e.g. a V-cycle with
    final_dot=True).

    Early exact convergence is safe: rz -> 0 would 0/0 the step (observed
    as NaN eigenpairs when a strong AMG inner preconditioner converged the
    solve inside the fixed budget), so alpha/beta are guarded to 0 there —
    the iterate then freezes, exactly what a converged chain should do.
    The guard is two scalar selects per iteration, invisible next to the
    matvec.

    Returns ``(x, r)``: the iterate and its (unpreconditioned) residual.
    """
    if M is None:
        M = lambda r: r
    if matvec_dot is None:
        def matvec_dot(p):
            Ap = matvec(p)
            return Ap, jnp.vdot(p, Ap)
    if M_dot is None:
        def M_dot(r):
            z = M(r)
            return z, jnp.vdot(r, z)

    def safe_div(num, den):
        ok = den != 0
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

    x0 = jnp.zeros_like(b) if x0 is None else x0
    r0 = b - matvec(x0)
    z0, rz0 = M_dot(r0)

    def body(i, state):
        x, r, z, p, rz = state
        Ap, pAp = matvec_dot(p)
        alpha = safe_div(rz, pAp)
        x = x + alpha * p
        r = r - alpha * Ap
        z, rz_new = M_dot(r)
        p = z + safe_div(rz_new, rz) * p
        return (x, r, z, p, rz_new)

    x, r, _, _, _ = jax.lax.fori_loop(0, iters, body, (x0, r0, z0, z0, rz0))
    return x, r


def cg_fixed_block(matvec_multi: Callable, B, iters, *,
                   M_multi: Optional[Callable] = None, x0=None):
    """Fixed-iteration PCG on q right-hand sides in lockstep.

    q INDEPENDENT CG chains share every SpMV: ``matvec_multi`` maps
    X [n, q] -> A X [n, q] (e.g. ELLMatrix.matvec_multi, whose banded
    Pallas path streams the matrix once for all q RHS), and the scalar
    recurrences become length-q vectors (column-wise dots).  This is NOT
    block CG (no cross-RHS search-space coupling) — each column produces
    exactly the iterate cg_fixed would, which keeps the eigen solver's
    contraction analysis unchanged while collapsing the q-fold wall
    (VERDICT r4 item 7, solve/eigen.py's column-serial inner loop).

    Per-column convergence stalls are safe: a converged column's rz -> 0
    would 0/0 the step, so both alpha and beta are guarded to 0 there
    (the column then freezes, exactly what a converged chain should do).

    Returns ``(X, R)``: iterates and (unpreconditioned) residuals [n, q].
    """
    if M_multi is None:
        M_multi = lambda R: R
    cdot = lambda U, V: jnp.sum(U * V, axis=0)          # [q]

    def safe_div(num, den):
        ok = den != 0
        return jnp.where(ok, num / jnp.where(ok, den, 1.0), 0.0)

    X0 = jnp.zeros_like(B) if x0 is None else x0
    R0 = B - matvec_multi(X0)
    Z0 = M_multi(R0)
    rz0 = cdot(R0, Z0)

    def body(i, state):
        X, R, Z, P, rz = state
        AP = matvec_multi(P)
        alpha = safe_div(rz, cdot(P, AP))
        X = X + alpha * P
        R = R - alpha * AP
        Z = M_multi(R)
        rz_new = cdot(R, Z)
        P = Z + safe_div(rz_new, rz) * P
        return (X, R, Z, P, rz_new)

    X, R, _, _, _ = jax.lax.fori_loop(0, iters, body,
                                      (X0, R0, Z0, Z0, rz0))
    return X, R
