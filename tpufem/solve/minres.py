"""(Preconditioned) MINRES, jit-compiled with lax.while_loop.

CG (solve/cg.py) requires a positive-definite operator; saddle-point
systems — Stokes [[A, B^T], [B, 0]] (solve/stokes.py), constrained
problems — are symmetric but INDEFINITE.  MINRES minimizes the residual
over the same Krylov space using the Lanczos three-term recurrence with
a Givens-rotation QR, so it needs only one matvec and one preconditioner
application per iteration, like CG.

The preconditioner must be symmetric positive definite (it defines the
inner product of the Lanczos process); block-diagonal SPD approximations
of the diagonal blocks are the standard choice for saddle-point systems.

The reference has no solver of any kind (SURVEY.md §0); this module, like
cg.py, is framework-original.  Same conventions as cg.py: operator
passed as a callable (dense matmul / ELL SpMV / matrix-free element
loop), NaN/breakdown guards instead of spinning to maxiter, all
reductions are jnp dots so the loop lowers to psum collectives under
shard_map unchanged.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

__all__ = ["MinresResult", "minres"]


class MinresResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array      # int32
    residual_norm: jax.Array   # final ||r||_{M^-1} / ||b||_{M^-1} estimate
    converged: jax.Array       # bool
    diverged: jax.Array        # bool (NaN/Inf or Lanczos breakdown)


def minres(matvec: Callable, b, x0=None, *, tol: float = 1e-8,
           maxiter: int = 1000, M: Optional[Callable] = None,
           check_every: int = 1) -> MinresResult:
    """Solve A x = b, A symmetric (possibly indefinite), with MINRES.

    matvec: x -> A x (A symmetric; definiteness NOT required).
    M:      optional SPD preconditioner application r -> M^-1 r.
    tol:    relative tolerance on the preconditioned residual norm
            (phibar / beta1 — the quantity the recurrence minimizes).

    ``check_every`` batches k Lanczos steps per convergence check, as in
    cg.py: the while_loop guard costs a device-wide sync per check, so
    batching recovers back-to-back pipelining at the price of up to k-1
    extra iterations.

    Singular-but-consistent systems (e.g. Stokes with the constant
    pressure mode projected out) are fine: the Lanczos vectors stay in
    range(A) when b does, and the guarded gamma keeps a converged
    recurrence frozen instead of dividing by zero.
    """
    if M is None:
        M = lambda r: r
    check_every = max(1, int(check_every))

    x0 = jnp.zeros_like(b) if x0 is None else x0
    r1 = b - matvec(x0)
    y = M(r1)
    beta1_sq = jnp.vdot(r1, y)
    # beta1 <= 0 with r1 != 0 means M is not SPD; flagged via `bad` below.
    beta1 = jnp.sqrt(jnp.maximum(beta1_sq, 0))
    safe_beta1 = jnp.where(beta1 > 0, beta1, 1)

    eps = jnp.finfo(b.dtype).eps

    def step(state):
        (x, r1_, r2, y_, w, w2, oldb, beta, dbar, epsln, phibar,
         cs, sn, k, bad) = state
        safe_beta = jnp.where(beta > 0, beta, 1)
        v = y_ / safe_beta
        Av = matvec(v)
        # three-term Lanczos: subtract projections on the two previous
        # M^-1-orthogonal directions
        Av = Av - jnp.where(k > 0, beta / jnp.where(oldb > 0, oldb, 1), 0) * r1_
        alfa = jnp.vdot(v, Av)
        Av = Av - (alfa / safe_beta) * r2
        r1n = r2
        r2n = Av
        yn = M(r2n)
        oldbn = beta
        beta_sq = jnp.vdot(r2n, yn)
        betan = jnp.sqrt(jnp.maximum(beta_sq, 0))
        # previous Givens rotation applied to the new tridiagonal column
        oldeps = epsln
        delta = cs * dbar + sn * alfa
        gbar = sn * dbar - cs * alfa
        epsln_n = sn * betan
        dbar_n = -cs * betan
        # current rotation
        gamma = jnp.sqrt(gbar * gbar + betan * betan)
        gamma = jnp.maximum(gamma, eps)
        cs_n = gbar / gamma
        sn_n = betan / gamma
        phi = cs_n * phibar
        phibar_n = sn_n * phibar
        # solution update directions
        w1 = w2
        w2n = w
        wn = (v - oldeps * w1 - delta * w2n) / gamma
        bad_n = (bad | ~jnp.isfinite(beta_sq) | (beta_sq < 0)
                 | ~jnp.isfinite(alfa))
        # keep the last finite iterate: the step that trips `bad` must
        # not pollute x (phi/wn may already be NaN here)
        xn = jnp.where(bad_n, x, x + phi * wn)
        return (xn, r1n, r2n, yn, wn, w2n, oldbn, betan, dbar_n,
                epsln_n, phibar_n, cs_n, sn_n, k + 1, bad_n)

    def not_done(state):
        phibar, k, bad = state[10], state[13], state[14]
        return (phibar > tol * safe_beta1) & (k < maxiter) & (~bad)

    def batched(state):
        # freeze the whole state once `bad` is set so the remaining steps
        # of a check_every batch cannot NaN-pollute the returned iterate
        # (cg.py's step_safe pattern)
        def step_safe(_, st):
            new = step(st)
            return tuple(jnp.where(st[14], o, n) for o, n in zip(st, new))
        return jax.lax.fori_loop(0, check_every, step_safe, state)

    zero = jnp.zeros_like(b)
    s0 = jnp.asarray(0, b.dtype)
    init = (x0, r1, r1, y, zero, zero, s0, beta1,
            s0, s0, beta1, -jnp.ones_like(s0), s0,
            jnp.int32(0), ~jnp.isfinite(beta1_sq) | (beta1_sq < 0))
    body = step if check_every == 1 else batched
    out = jax.lax.while_loop(not_done, body, init)
    x, phibar, k, bad = out[0], out[10], out[13], out[14]

    relres = phibar / safe_beta1
    converged = (relres <= tol) & (~bad)
    return MinresResult(x=x, iterations=k, residual_norm=relres,
                        converged=converged, diverged=bad)
