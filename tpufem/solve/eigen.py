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

The inner preconditioner must be mesh-robust at scale: the outer
accuracy floors at the inner-solve accuracy, and a fixed inner budget
with Jacobi/Chebyshev degrades as cond(A) ~ 1/h^2 grows (measured 17% /
6.6% eigenvalue error at 491k DOFs) — pass an AMG V-cycle
(``AMGHierarchy.apply`` / ``apply_multi``) as ``M`` / ``M_multi``, which
keeps ~20 inner iterations accurate to the fp32 floor at any size.

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

__all__ = ["EigenResult", "smallest_eigenpairs"]


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
                        M_multi: Optional[Callable] = None) -> EigenResult:
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
    floor is ~1e-6.
    """
    q = k + buffer
    mL = (jnp.ones(n, dtype) if lumped_mass is None
          else jnp.asarray(lumped_mass, dtype))
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

    def ritz(Y):
        """Rayleigh-Ritz on span(Y) for the pencil (A, diag(mL))."""
        AY = amv_block(Y)
        Ah = Y.T @ AY
        Mh = Y.T @ (mL[:, None] * Y)
        eps = jnp.finfo(Ah.dtype).eps     # dtype-robust: the requested
        # float64 silently demotes to float32 when x64 is off, and a
        # fixed 1e-14 shift would then be below machine precision
        L = jnp.linalg.cholesky(
            0.5 * (Mh + Mh.T)
            + 100.0 * eps * jnp.trace(Mh) * jnp.eye(q, dtype=Ah.dtype))
        Li = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(q, dtype=dtype), lower=True)
        w, V = jnp.linalg.eigh(Li @ (0.5 * (Ah + Ah.T)) @ Li.T)
        return w, Y @ (Li.T @ V)          # ascending; M_L-orthonormal

    rng = jax.random.PRNGKey(seed)
    X = projB(jax.random.normal(rng, (n, q), dtype))

    def body(i, X):
        Y = projB(ainv_block(mL[:, None] * X))
        _, U = ritz(Y)
        return U

    X = jax.lax.fori_loop(0, outer_iters, body, X)
    lam, U = ritz(X)
    lam, U = lam[:k], U[:, :k]
    AU = amv_block(U)
    res = jnp.stack([
        jnp.linalg.norm(AU[:, j] - lam[j] * mL * U[:, j])
        / jnp.maximum(jnp.linalg.norm(AU[:, j]),
                      jnp.finfo(AU.dtype).tiny)
        for j in range(k)])
    return EigenResult(eigenvalues=lam, eigenvectors=U,
                       iterations=outer_iters, residual_norms=res)
