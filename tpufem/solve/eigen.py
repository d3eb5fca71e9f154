"""Modal analysis: smallest eigenpairs of FEM operators.

The reference has no eigen-capability (no solver at all, SURVEY.md §0).
This module computes the smallest generalized eigenpairs

    A u = lambda M_L u        (A SPD stiffness, M_L lumped mass)

by **block inverse subspace iteration with Rayleigh-Ritz**: each outer
step solves A Y = M_L X column-wise with fixed-iteration preconditioned
CG (``cg_fixed`` — zero control flow; AMG/Jacobi preconditioned), then
rotates the block onto the Ritz vectors of the small projected pencil.
Everything is dense-small (q x q eigh on the MXU) or a matvec/solve —
one compiled XLA program, no host round-trips.

Two things must be mesh-robust at scale, and both floor the outer
Rayleigh-Ritz accuracy:

1. the INNER SOLVE — a fixed inner budget with Jacobi/Chebyshev
   degrades as cond(A) ~ 1/h^2 grows (measured 17% / 6.6% eigenvalue
   error at 491k DOFs); pass an AMG V-cycle (``AMGHierarchy.apply`` /
   ``apply_multi``) as ``M`` / ``M_multi``;
2. the ARITHMETIC — the fp32 SpMV floor is eps32 * cond(A) because A
   has O(1) entries while A u = O(h^2) u for smooth eigenvectors (a
   4-orders-of-magnitude cancellation at 500k DOFs), so past ~100k DOFs
   fp32 eigenvalues are wrong no matter the solver (measured: +0.14
   uniform inflation, O(1) residuals — identical under Chebyshev and
   AMG inners); pass ``matvec_hi_multi`` (an fp64 gather SpMV) to run
   MIXED PRECISION: fp64 subspace/Gram/residuals, fp32 Pallas inner
   solves wrapped in iterative refinement (same design as solve.refine).

Why not LOBPCG-on-the-inverse: jax's ``lobpcg_standard`` finds TOP
eigenpairs of a LINEAR operator, but a fixed-iteration CG "inverse" is
rhs-adaptive (CG's polynomial depends on the right-hand side), which
violates the linearity assumption and destabilizes the orthogonal-
ization; plain shift (sigma I - A) is linear but its top cluster has
hopeless relative gaps.  Subspace iteration tolerates the approximate
inverse gracefully — accuracy of the inner solve only shifts the outer
contraction rate.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpufem.solve.cg import cg_fixed, cg_fixed_block

__all__ = ["EigenResult", "smallest_eigenpairs", "subspace_stepper"]


class EigenResult(NamedTuple):
    eigenvalues: jax.Array     # [k] ascending
    eigenvectors: jax.Array    # [n, k] M_L-orthonormal
    iterations: int            # outer subspace iterations run
    residual_norms: jax.Array  # [k] ||A u - lam M_L u|| / ||A u||


def smallest_eigenpairs(matvec: Callable, n: int, k: int, *,
                        lumped_mass=None, M: Optional[Callable] = None,
                        bc_mask=None, inner_iters: int = 40,
                        outer_iters: int = 30, buffer: int = 3,
                        dtype=jnp.float64, seed: int = 0,
                        matvec_multi: Optional[Callable] = None,
                        M_multi: Optional[Callable] = None,
                        matvec_hi_multi: Optional[Callable] = None,
                        refine_steps: int = 3) -> EigenResult:
    """k smallest eigenpairs of ``A u = lambda M_L u``.

    matvec:      x -> A x (SPD; BC rows identity-like).
    lumped_mass: [n] lumped mass diagonal (None = standard problem).
    M:           inner-CG preconditioner (AMG/Jacobi) for the A-solves.
    bc_mask:     constrained DOFs, projected out of the iteration.
    inner_iters: CG iterations per inverse application.
    buffer:      extra subspace vectors; eigenpair j contracts per outer
                 step like (lambda_j / lambda_{k+buffer+1}).

    matvec_multi: optional X [n, q] -> A X (e.g. ELLMatrix.matvec_multi,
    whose banded Pallas path streams the matrix once for all q RHS).
    When given, the q = k+buffer inner solves run as LOCKSTEP batched CG
    chains (solve.cg.cg_fixed_block) instead of column-serial Python —
    the round-4 q-fold wall-clock cost collapses to ~one matvec stream
    per iteration.  ``M_multi`` batches the preconditioner likewise
    (default: vmap of ``M`` over columns when both are wanted).
    Without matvec_multi the column-serial fallback is used.
    ``dtype`` follows jax's x64 setting: with x64 off everything
    runs (correctly, eps-scaled) in float32 and the achievable residual
    floor is ~eps32 * cond(A) — fine at small n, but cond(A) ~ 1/h^2, so
    by ~500k DOFs the floor is O(1e-2) and the eigenvalues are WRONG
    regardless of inner solver (measured: +0.14 uniform eigenvalue
    inflation and O(1) residuals at 491k DOFs).  The cancellation lives
    in the SpMV itself: A has O(1) entries but A u = O(h^2) u for smooth
    eigenvectors, so fp32 matvec roundoff injects high-frequency noise
    4 orders of magnitude above the signal.

    matvec_hi_multi: optional X [n, q] -> A X evaluated in FLOAT64 (the
    XLA gather path on float64-cast ELL data — Mosaic has no f64, but
    XLA emulates it; a couple of these per outer step is a rounding
    error next to the inner CG work).  When given, the solver runs in
    MIXED PRECISION — the TPU-native answer to the fp32 floor, same
    design as solve.refine: the subspace, Gram matrices, and residuals
    live in fp64; each inverse application is ``refine_steps`` rounds of
    iterative refinement whose inner solves are the fast fp32 Pallas
    CG/AMG path.  Each round multiplies the error by the fp32 floor
    (~eps32 * cond), so 3 rounds reach ~1e-7 eigenvector accuracy at
    500k DOFs.  Requires jax_enable_x64.  The q x q Ritz decompositions
    stay in fp32 (TPU eigh has no f64) — harmless, since the Gram
    entries are O(lambda) with no cancellation.
    """
    X0, body, finish = subspace_stepper(
        matvec, n, k, lumped_mass=lumped_mass, M=M, bc_mask=bc_mask,
        inner_iters=inner_iters, outer_iters=outer_iters, buffer=buffer,
        dtype=dtype, seed=seed, matvec_multi=matvec_multi,
        M_multi=M_multi, matvec_hi_multi=matvec_hi_multi,
        refine_steps=refine_steps)
    X = jax.lax.fori_loop(0, outer_iters, lambda i, X: body(X), X0)
    return finish(X)


def subspace_stepper(matvec: Callable, n: int, k: int, *,
                     lumped_mass=None, M: Optional[Callable] = None,
                     bc_mask=None, inner_iters: int = 40,
                     outer_iters: int = 30, buffer: int = 3,
                     dtype=jnp.float64, seed: int = 0,
                     matvec_multi: Optional[Callable] = None,
                     M_multi: Optional[Callable] = None,
                     matvec_hi_multi: Optional[Callable] = None,
                     refine_steps: int = 3):
    """The subspace iteration as an ``(X0, step, finish)`` triple.

    Same parameters and math as :func:`smallest_eigenpairs` (which is
    exactly ``finish(fori_loop(step, X0))``), exposed so the OUTER loop
    can run on the host: jit ``step``/``finish`` separately with the
    operators passed as pytree arguments and loop in Python.  Use this
    at large scale to bound single-execution device time — one fused
    25-outer-step program at 1M DOFs runs minutes-long device
    executions, which exceed infrastructure execution limits in relayed
    environments (the modal-1M `UNAVAILABLE` fault, BENCH_NOTES r5
    phase F3: every ingredient and a one-outer-step program pass
    individually), while per-step executions stay seconds-long at an
    O(ms) dispatch cost per step.  ``outer_iters`` here only stamps
    ``EigenResult.iterations``; the caller decides how many times to
    apply ``step``.
    """
    q = k + buffer
    mixed = matvec_hi_multi is not None
    if mixed and not jax.config.read("jax_enable_x64"):
        raise RuntimeError(
            "mixed-precision eigen (matvec_hi_multi) needs fp64 "
            "accumulation: call jax.config.update('jax_enable_x64', "
            "True) before tracing")
    work = jnp.float64 if mixed else dtype
    dec = jnp.float32 if mixed else dtype   # q x q decompositions
    mL = (jnp.ones(n, work) if lumped_mass is None
          else jnp.asarray(lumped_mass, work))
    if bc_mask is not None:
        bcm = jnp.asarray(bc_mask)
        projB = lambda V: jnp.where(bcm[:, None], 0.0, V)
    else:
        projB = lambda V: V

    if matvec_multi is not None:
        amv_block = matvec_multi
        Mm = M_multi
        if Mm is None and M is not None:
            Mm = jax.vmap(M, in_axes=1, out_axes=1)

        def ainv_block(X):
            return cg_fixed_block(matvec_multi, X, inner_iters,
                                  M_multi=Mm)[0]
    else:
        def amv_block(X):
            return jnp.stack([matvec(X[:, j]) for j in range(X.shape[1])],
                             axis=1)

        def ainv_block(X):
            cols = [cg_fixed(matvec, X[:, j], inner_iters, M=M)[0]
                    for j in range(X.shape[1])]
            return jnp.stack(cols, axis=1)

    if mixed:
        amv_work = matvec_hi_multi

        def ainv_work(B):
            """A^-1 B by iterative refinement: fp32 inner solves, fp64
            residuals/accumulation.  Each column is rescaled to O(1)
            before the fp32 solve so it never under/overflows as the
            residual shrinks toward eps64 * ||B||."""
            def solve32(R):
                s = jnp.max(jnp.abs(R), axis=0)
                s = jnp.where(s > 0, s, 1.0)
                D = ainv_block((R / s).astype(jnp.float32))
                return s * D.astype(work)

            Y = solve32(B)
            for _ in range(refine_steps - 1):
                Y = Y + solve32(B - matvec_hi_multi(Y))
            return Y
    else:
        amv_work, ainv_work = amv_block, ainv_block

    def ritz(Y):
        """Rayleigh-Ritz on span(Y) for the pencil (A, diag(mL)).
        Gram matrices accumulate in the working dtype (fp64 when mixed);
        the q x q decompositions run in ``dec`` — their entries are
        O(lambda) with no cancellation, so fp32 costs ~eps32 RELATIVE
        eigenvalue error, unlike the length-n reductions."""
        AY = amv_work(Y)
        Ah = (Y.T @ AY).astype(dec)
        Mh = (Y.T @ (mL[:, None] * Y)).astype(dec)
        eps = jnp.finfo(dec).eps          # dtype-robust: the requested
        # float64 silently demotes to float32 when x64 is off, and a
        # fixed 1e-14 shift would then be below machine precision
        L = jnp.linalg.cholesky(
            0.5 * (Mh + Mh.T)
            + 100.0 * eps * jnp.trace(Mh) * jnp.eye(q, dtype=dec))
        Li = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(q, dtype=dec), lower=True)
        w, V = jnp.linalg.eigh(Li @ (0.5 * (Ah + Ah.T)) @ Li.T)
        return (w.astype(work),           # ascending; M_L-orthonormal
                Y @ (Li.T @ V).astype(work))

    rng = jax.random.PRNGKey(seed)
    X0 = projB(jax.random.normal(rng, (n, q), work))

    def step(X):
        Y = projB(ainv_work(mL[:, None] * X))
        _, U = ritz(Y)
        return U

    def finish(X):
        lam, U = ritz(X)
        lam, U = lam[:k], U[:, :k]
        AU = amv_work(U)
        res = jnp.stack([
            jnp.linalg.norm(AU[:, j] - lam[j] * mL * U[:, j])
            / jnp.maximum(jnp.linalg.norm(AU[:, j]),
                          jnp.finfo(AU.dtype).tiny)
            for j in range(k)])
        return EigenResult(eigenvalues=lam, eigenvectors=U,
                           iterations=outer_iters, residual_norms=res)

    return X0, step, finish
