"""Preconditioners: Jacobi, block-Jacobi, and Chebyshev-Jacobi.

No counterpart in the reference (it has no solver).  Jacobi is the standard
companion of the ELL stiffness matrix (BASELINE.md config 3); block-Jacobi
pairs with the BCSR vector-element format (config 4).  Chebyshev-Jacobi is
the mesh-size-robust choice for *unstructured* systems where geometric
multigrid's nested grids don't exist (VERDICT.md r2 item 5): a fixed
degree-m polynomial in D^-1 A applied per PCG iteration — m SpMVs (cheap:
the banded Pallas kernel) traded against ~m-fold fewer CG outer iterations
(each of which costs full-field dots + axpys and their syncs).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # keep fp32 einsums in fp32 on TPU

from tpufem.sparse.ell import ELLMatrix

__all__ = ["jacobi", "jacobi_from_diagonal", "block_jacobi",
           "chebyshev", "estimate_lambda_max", "lambda_max_bound"]


def jacobi_from_diagonal(diag):
    """Preconditioner r -> r / diag (guarding zero diagonal entries)."""
    inv = jnp.where(diag != 0, 1.0 / diag, 1.0)

    def apply(r):
        return r * inv

    return apply


def jacobi(A: ELLMatrix):
    """Jacobi preconditioner extracted from an ELL matrix."""
    return jacobi_from_diagonal(A.diagonal())


def block_jacobi(diag_blocks):
    """Block-Jacobi from [n_blocks, b, b] diagonal blocks (e.g. the 2x2/3x3
    per-node blocks of a vector-elasticity BCSR matrix).

    Factorizes once (batched inverse of small SPD blocks via explicit
    adjugate-free jnp.linalg.inv — blocks are tiny, XLA unrolls them) and
    applies as a batched matvec.
    """
    inv_blocks = jnp.linalg.inv(diag_blocks)   # [nb, b, b]
    bsize = diag_blocks.shape[-1]

    def apply(r):
        rb = r.reshape(-1, bsize)
        out = (inv_blocks * rb[:, None, :]).sum(2)
        return out.reshape(r.shape)

    return apply


def estimate_lambda_max(matvec, diag, n, *, iters: int = 25, seed: int = 0,
                        dtype=jnp.float32, boost: float = 1.05):
    """Largest eigenvalue of D^-1 A by power iteration (setup-time, jitted).

    ``matvec``: x -> A x;  ``diag``: the diagonal of A.  Returns a float.
    ``boost`` inflates the estimate slightly so the Chebyshev interval is
    guaranteed to cover the spectrum (an underestimated lmax diverges the
    polynomial; an overestimate only costs a few percent).

    .. warning:: power iteration converges slowly when the top of the
       spectrum is clustered — on a 1M-row RCM system 25 iterations (+5%)
       still sat ~20% BELOW the true lmax and Chebyshev-PCG diverged
       (BENCH_NOTES r3).  For a concrete ELL matrix prefer
       :func:`lambda_max_bound`, a guaranteed upper bound.
    """
    inv_d = jnp.where(diag != 0, 1.0 / diag, 1.0).astype(dtype)
    key = jax.random.PRNGKey(seed)
    v0 = jax.random.normal(key, (n,), dtype)

    @jax.jit
    def run(v):
        def body(i, carry):
            v, _ = carry
            w = inv_d * matvec(v)
            lam = jnp.vdot(v, w) / jnp.vdot(v, v)
            return w / jnp.linalg.norm(w), lam
        return jax.lax.fori_loop(0, iters, body, (v0, jnp.zeros((), dtype)))

    _, lam = run(v0)
    return float(lam) * boost


def lambda_max_bound(A: ELLMatrix) -> float:
    """Guaranteed upper bound on spec(D^-1 A) via Gershgorin row sums.

    For each row i of B = D^-1 A every eigenvalue lies in a disc centered
    at b_ii with radius sum_{j!=i} |b_ij|, so
    ``max_i sum_j |a_ij| / d_i`` bounds the whole spectrum from above.
    ELL padding slots hold 0 and do not contribute.  One O(nnz) pass,
    never an underestimate — the safe ``lmax`` for :func:`chebyshev`
    (power iteration underestimated by ~20% at 1M rows and diverged the
    polynomial; Gershgorin overestimates by <= 2x on FEM stiffness
    matrices, costing only a few percent in the damped interval).
    """
    diag = A.diagonal()
    inv_d = jnp.where(diag != 0, 1.0 / diag, 1.0)
    return float(jnp.max(jnp.sum(jnp.abs(A.data), axis=1) * inv_d))


def chebyshev(matvec, diag, *, degree: int = 10, lmax: float,
              lmin_ratio: float = 30.0):
    """Chebyshev-Jacobi polynomial preconditioner r -> p_m(D^-1 A) D^-1 r.

    Runs ``degree`` steps of the preconditioned Chebyshev iteration for
    A z = r from z = 0 (Saad, "Iterative Methods for Sparse Linear
    Systems", Alg. 12.1), targeting the interval
    [lmax/lmin_ratio, lmax] of the Jacobi-preconditioned spectrum.  The
    result z = p(D^-1 A) D^-1 r is linear in r with fixed coefficients and
    symmetric positive definite (p > 0 on the covered spectrum), so it is
    a valid CG preconditioner; the low-frequency tail below
    lmax/lmin_ratio is left to the outer CG.

    ``lmax`` must upper-bound spec(D^-1 A) — use :func:`lambda_max_bound`
    (an under-estimate makes the polynomial amplify the top modes and CG
    diverges; measured at 1M rows with the power-iteration estimate,
    BENCH_NOTES r3).
    """
    lmax = float(lmax)
    lmin = lmax / float(lmin_ratio)
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    inv_d = jnp.where(diag != 0, 1.0 / diag, 1.0)
    m = int(degree)
    # precompute the rho recurrence (host floats -> compile-time constants)
    rhos = []
    rho = 1.0 / sigma1
    for _ in range(m):
        rhos.append(rho)
        rho = 1.0 / (2.0 * sigma1 - rho)

    def apply(r0):
        # shape-agnostic Jacobi scaling: [n] vectors and [n, q] multi-RHS
        # blocks (pass a multi-RHS matvec, e.g. ELLMatrix.matvec_multi,
        # and the polynomial preconditions all q columns per stream)
        idv = inv_d if r0.ndim == 1 else inv_d[:, None]
        d = (idv * r0) / theta
        z = d
        r = r0
        for k in range(1, m):
            r = r - matvec(d)          # r_k (the final r_m is never needed)
            d = rhos[k] * rhos[k - 1] * d + (2.0 * rhos[k] / delta) * (
                idv * r)
            z = z + d
        return z

    return apply
