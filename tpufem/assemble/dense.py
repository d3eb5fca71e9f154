"""Dense global assembly (small problems / golden-reference path).

Replaces the reference's global-memory atomicAdd scatter
(/root/reference/fea_test.cu:238-248) with a single XLA scatter-add.  Note the
reference writes A[N*gj + gi] — a transposed index hidden by operator symmetry
(SURVEY.md §2.5, fea_test.cu:246); we assemble the mathematically stated
A[gi, gj].
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["assemble_dense", "assemble_vector"]


def assemble_dense(dof_conn, element_matrices, num_dofs: int):
    """Sum local matrices into a dense [num_dofs, num_dofs] global matrix.

    dof_conn: [NE, n] int32; element_matrices: [NE, n, n].
    """
    conn = jnp.asarray(dof_conn)
    rows = conn[:, :, None]
    cols = conn[:, None, :]
    A = jnp.zeros((num_dofs, num_dofs), element_matrices.dtype)
    return A.at[rows, cols].add(element_matrices)


def assemble_vector(dof_conn, element_vectors, num_dofs: int):
    """Sum local load vectors into the global RHS vector [num_dofs]."""
    conn = jnp.asarray(dof_conn)
    b = jnp.zeros((num_dofs,), element_vectors.dtype)
    return b.at[conn].add(element_vectors)
