"""Dirichlet boundary-condition application.

The reference has **no** boundary-condition code at all (SURVEY.md §0: its
model problem -Δu = 36 - 2(x²+y²), u=0 on ∂(-3,3)² is implied but never
applied).  This module fills that gap with symmetric elimination:

    b <- b - A g ;  b[bc] <- g[bc] ;  A[bc, :] <- 0 ; A[:, bc] <- 0 ;
    A[bc, bc] <- 1

which preserves symmetry (so CG still applies) and enforces u[bc] = g[bc]
exactly.  Works on dense matrices, ELL matrices, and matrix-free operators
(via the ``constrained_operator`` wrapper).
"""
from __future__ import annotations

import jax.numpy as jnp

from tpufem.sparse.ell import ELLMatrix

__all__ = [
    "apply_dirichlet_dense", "apply_dirichlet_ell", "apply_dirichlet_stencil",
    "constrained_operator", "constrain_rhs",
]


def _bc_arrays(b, bc_mask, bc_values):
    mask = jnp.asarray(bc_mask)
    if bc_values is None:
        g = jnp.zeros_like(b)
    else:
        g = jnp.broadcast_to(jnp.asarray(bc_values, b.dtype), b.shape)
    return mask, jnp.where(mask, g, 0)


def apply_dirichlet_dense(A, b, bc_mask, bc_values=None):
    """Symmetric Dirichlet elimination on a dense system. Returns (A, b)."""
    mask, g = _bc_arrays(b, bc_mask, bc_values)
    b = b - A @ g
    b = jnp.where(mask, g, b)
    keep = (~mask).astype(A.dtype)
    A = A * keep[:, None] * keep[None, :]
    n = A.shape[0]
    diag = jnp.where(mask, jnp.ones((), A.dtype), jnp.diagonal(A))
    A = A.at[jnp.arange(n), jnp.arange(n)].set(diag)
    return A, b


def apply_dirichlet_ell(A: ELLMatrix, b, bc_mask, bc_values=None):
    """Symmetric Dirichlet elimination on an ELL system. Returns (A, b)."""
    mask, g = _bc_arrays(b, bc_mask, bc_values)
    # direct gather matvec: this is a one-time setup op — don't let
    # ELLMatrix.matvec build a banded Pallas plan for the pre-BC matrix
    from tpufem.sparse.ell import ell_matvec
    b = b - ell_matvec(A.data, A.cols, g)
    b = jnp.where(mask, g, b)

    keep_row = ~mask
    keep_col = ~mask[A.cols]
    data = jnp.where(keep_row[:, None] & keep_col, A.data, 0)
    if A.diag_pos is None:
        raise ValueError("ELLMatrix needs diag_pos for BC application")
    n = data.shape[0]
    rows = jnp.arange(n)
    diag_old = data[rows, A.diag_pos]
    diag_new = jnp.where(mask, jnp.ones((), data.dtype), diag_old)
    data = data.at[rows, A.diag_pos].set(diag_new)
    return ELLMatrix(data, A.cols, A.row_lengths, A.diag_pos), b


def apply_dirichlet_stencil(A, b, bc_mask, bc_values=None):
    """Symmetric Dirichlet elimination on a StencilMatrix system."""
    import jax

    from tpufem.sparse.stencil import StencilMatrix

    mask, g = _bc_arrays(b, bc_mask, bc_values)
    b = b - A.matvec(g)
    b = jnp.where(mask, g, b)

    n = A.data.shape[1]
    halo = max(abs(o) for o in A.offsets) if A.offsets else 0
    mask_p = jnp.pad(mask, (halo, halo))
    rows_keep = ~mask
    new_diags = []
    for k, off in enumerate(A.offsets):
        col_bc = jax.lax.dynamic_slice(mask_p, (halo + off,), (n,))
        d = jnp.where(rows_keep & ~col_bc, A.data[k], 0)
        if off == 0:
            d = jnp.where(mask, jnp.ones((), d.dtype), d)
        new_diags.append(d)
    return StencilMatrix(jnp.stack(new_diags), A.offsets), b


def constrain_rhs(matvec, b, bc_mask, bc_values=None):
    """RHS for the matrix-free constrained system. Returns (b_mod, g)."""
    mask, g = _bc_arrays(b, bc_mask, bc_values)
    b = b - matvec(g)
    b = jnp.where(mask, g, b)
    return b, g


def constrained_operator(matvec, bc_mask):
    """Wrap a matvec so constrained DOFs act as identity rows/cols.

    y = P A P x + (I - P) x  with P = diag(~mask): symmetric, and equal to
    the eliminated matrix when x[bc] carries the BC values.
    """
    mask = jnp.asarray(bc_mask)

    def constrained(x):
        xi = jnp.where(mask, 0, x)
        y = matvec(xi)
        return jnp.where(mask, x, y)

    return constrained
