"""BCSR (block-ELL) sparse matrix for vector-valued problems.

Vector elements (e.g. 2D/3D elasticity) couple nodes through dense b x b
blocks (b = components).  Storing one block per scalar-pattern slot —
``data [ns, K, b, b]`` over the *node* adjacency — keeps the index arrays b²
times smaller than scalar ELL and turns SpMV into a batched small-matmul
einsum that XLA maps onto the MXU (BASELINE.md config 4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST  # keep fp32 einsums in fp32 on TPU

from tpufem.mesh.adjacency import ELLPattern

__all__ = ["BCSRMatrix", "assemble_bcsr", "apply_dirichlet_bcsr"]


@jax.tree_util.register_pytree_node_class
class BCSRMatrix:
    """data [ns, K, b, b]; cols [ns, K] (scalar/node pattern);
    DOF layout is node-major, component-minor (tpufem.fem.space)."""

    def __init__(self, data, cols, diag_pos=None):
        self.data = data
        self.cols = cols
        self.diag_pos = diag_pos

    def tree_flatten(self):
        return (self.data, self.cols, self.diag_pos), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def block_size(self):
        return self.data.shape[-1]

    @property
    def shape(self):
        n = self.data.shape[0] * self.block_size
        return (n, n)

    def matvec(self, x):
        ns, k, b, _ = self.data.shape
        xb = x.reshape(ns, b)
        gathered = xb[self.cols]                       # [ns, K, b]
        y = (self.data * gathered[:, :, None, :]).sum(axis=(1, 3))
        return y.reshape(-1)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal_blocks(self):
        rows = jnp.arange(self.data.shape[0])
        return self.data[rows, self.diag_pos]          # [ns, b, b]

    def to_dense(self):
        ns, k, b, _ = self.data.shape
        n = ns * b
        A = jnp.zeros((n, n), self.data.dtype)
        for kk in range(k):
            rows = jnp.repeat(jnp.arange(ns) * b, b * b)
            cols = jnp.repeat(self.cols[:, kk] * b, b * b)
            ri = jnp.tile(jnp.repeat(jnp.arange(b), b), ns)
            ci = jnp.tile(jnp.tile(jnp.arange(b), b), ns)
            A = A.at[rows + ri, cols + ci].add(self.data[:, kk].reshape(-1))
        return A


def assemble_bcsr(pattern: ELLPattern, element_matrices, block_size: int
                  ) -> BCSRMatrix:
    """Local matrices [NE, nl*b, nl*b] (node-major-comp-minor DOF order) ->
    BCSR on the scalar node pattern.

    ``pattern`` must be built over the scalar DOF connectivity.
    """
    ns, K = pattern.cols.shape
    ne = element_matrices.shape[0]
    b = block_size
    nl = element_matrices.shape[1] // b
    Ke = element_matrices.reshape(ne, nl, b, nl, b)
    blocks = jnp.transpose(Ke, (0, 1, 3, 2, 4)).reshape(-1, b, b)
    slots = jnp.asarray(pattern.slots.reshape(-1))
    flat = jnp.zeros((ns * K, b, b), blocks.dtype).at[slots].add(blocks)
    return BCSRMatrix(
        data=flat.reshape(ns, K, b, b),
        cols=jnp.asarray(pattern.cols),
        diag_pos=jnp.asarray(pattern.diag_pos),
    )


def apply_dirichlet_bcsr(A: BCSRMatrix, b_vec, bc_mask, bc_values=None):
    """Symmetric DOF-level Dirichlet elimination on a BCSR system."""
    mask = jnp.asarray(bc_mask)
    if bc_values is None:
        g = jnp.zeros_like(b_vec)
    else:
        g = jnp.broadcast_to(jnp.asarray(bc_values, b_vec.dtype), b_vec.shape)
    g = jnp.where(mask, g, 0)
    b_vec = b_vec - A.matvec(g)
    b_vec = jnp.where(mask, g, b_vec)

    ns, K, bs, _ = A.data.shape
    mask_b = mask.reshape(ns, bs)
    row_keep = (~mask_b).astype(A.data.dtype)          # [ns, b]
    col_keep = (~mask_b[A.cols]).astype(A.data.dtype)  # [ns, K, b]
    data = A.data * row_keep[:, None, :, None] * col_keep[:, :, None, :]
    # identity on constrained diagonal entries
    rows = jnp.arange(ns)
    diag = data[rows, A.diag_pos]
    diag = diag + mask_b[:, :, None] * jnp.eye(bs, dtype=data.dtype)
    data = data.at[rows, A.diag_pos].set(diag)
    return BCSRMatrix(data, A.cols, A.diag_pos), b_vec
