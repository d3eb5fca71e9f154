"""Preconditioners: Jacobi and block-Jacobi.

No counterpart in the reference (it has no solver).  Jacobi is the standard
companion of the ELL stiffness matrix (BASELINE.md config 3); block-Jacobi
pairs with the BCSR vector-element format (config 4).  Both are pure
elementwise / small-batched-solve ops that fuse into the CG iteration.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # keep fp32 einsums in fp32 on TPU

from tpufem.sparse.ell import ELLMatrix

__all__ = ["jacobi", "jacobi_from_diagonal", "block_jacobi"]


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
