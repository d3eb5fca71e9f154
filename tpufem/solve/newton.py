"""Matrix-free Newton-Krylov for nonlinear FEM systems.

The reference differentiates its weak forms symbolically with GiNaC
(/root/reference/fea_symbolic.cu:20-71) and stops at linear problems.
On TPU the functional-transform stack subsumes both steps: the user
supplies only the assembled nonlinear residual ``R(u)`` (built from the
same element kernels as any linear assembly), and the Jacobian-vector
product the Krylov solver needs is ``jax.jvp`` of that residual — exact
to machine precision, no symbolic engine, no assembled Jacobian matrix,
no coloring.  One Newton step solves

    J(u) s = -R(u),       J(u) v = jvp(R, u)(v)

with the (guarded, jittable) CG of tpufem.solve.cg; J is symmetric
positive definite for gradient-flow problems (semilinear diffusion with
monotone nonlinearity, p-Laplacian away from degeneracy, ...).

Inexact-Newton forcing: the inner tolerance follows Eisenstat-Walker
choice 2 (eta_k = gamma (||R_k||/||R_{k-1}||)^2, safeguarded), so early
iterations don't over-solve the linear model.  The whole outer loop is a
``lax.while_loop`` — one compiled program, no host round-trips.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpufem.solve.cg import cg

__all__ = ["NewtonResult", "newton_krylov"]


class NewtonResult(NamedTuple):
    x: jax.Array
    iterations: jax.Array        # outer Newton steps taken (int32)
    residual_norm: jax.Array     # final ||R(x)|| / ||R(x0)||
    converged: jax.Array         # bool
    inner_iterations: jax.Array  # total CG iterations across all steps


def newton_krylov(residual: Callable, x0, *, tol: float = 1e-8,
                  maxiter: int = 30, inner_maxiter: int = 500,
                  M: Optional[Callable] = None,
                  forcing_max: float = 0.1, forcing_min: float = 1e-6,
                  damping: float = 1.0) -> NewtonResult:
    """Solve R(x) = 0 by inexact Newton with matrix-free CG inner solves.

    residual:  x -> R(x), the assembled + BC-applied nonlinear residual
               (constrained DOFs should carry R = x - g so Newton fixes
               them in one step).
    M:         optional inner-CG preconditioner (e.g. Jacobi/AMG of the
               frozen linear part; it only changes inner iteration
               counts, never the Newton trajectory's limit).
    tol:       relative tolerance on ||R|| vs the initial residual.
    damping:   fixed step scaling (1.0 = full Newton).

    Fully jittable; the returned arrays are device scalars.
    """
    x0 = jnp.asarray(x0)
    r0 = residual(x0)
    n0 = jnp.linalg.norm(r0)
    safe_n0 = jnp.where(n0 > 0, n0, 1.0)

    def cond(state):
        _, k, rn, prev, inner = state
        return (rn > tol * safe_n0) & (k < maxiter) & jnp.isfinite(rn)

    def step(state):
        x, k, rn, prev, inner = state
        # linearize pays the primal ONCE per Newton step and returns both
        # R(x) and the tangent map; jax.jvp inside the CG body would
        # re-evaluate the full primal assembly on every inner iteration
        r, jmv = jax.linearize(residual, x)

        # Eisenstat-Walker choice 2 forcing, safeguarded
        eta = jnp.where(prev > 0, 0.9 * (rn / prev) ** 2, forcing_max)
        eta = jnp.clip(eta, forcing_min, forcing_max)
        res = cg(jmv, -r, tol=eta, maxiter=inner_maxiter, M=M,
                 check_every=4)
        s = res.x

        # Armijo backtracking on ||R||: full Newton overshoots badly far
        # from the solution (a cubic nonlinearity amplifies a large step
        # to astronomical residuals); halve the step until it contracts.
        # Near the solution lambda = 1 is accepted immediately, so the
        # quadratic local rate is untouched.
        lam0 = jnp.asarray(damping, x0.dtype)
        rn_try = jnp.linalg.norm(residual(x + lam0 * s))

        def ls_cond(ls):
            lam, rnt, t = ls
            grow = ~jnp.isfinite(rnt) | (rnt > (1.0 - 1e-4 * lam) * rn)
            return grow & (t < 40)

        def ls_step(ls):
            lam, _, t = ls
            lam2 = 0.5 * lam
            return (lam2, jnp.linalg.norm(residual(x + lam2 * s)), t + 1)

        lam, rn_new, _ = jax.lax.while_loop(
            ls_cond, ls_step, (lam0, rn_try, jnp.int32(0)))
        x_new = x + lam * s
        return (x_new, k + 1, rn_new, rn,
                inner + res.iterations.astype(jnp.int32))

    # tol is relative to ||R(x0)||; run the loop on (x, k, ||R||, prev, it)
    state = (x0, jnp.int32(0), n0, jnp.zeros_like(n0),
             jnp.int32(0))
    x, k, rn, _, inner = jax.lax.while_loop(cond, step, state)
    return NewtonResult(x=x, iterations=k,
                        residual_norm=rn / safe_n0,
                        converged=rn <= tol * safe_n0,
                        inner_iterations=inner)
