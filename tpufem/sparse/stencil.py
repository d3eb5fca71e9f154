"""Stencil (offset-diagonal) sparse matrix: the structured-mesh fast path.

On the reference's structured meshes, every row's column indices are fixed
offsets from the row index (the 7-point pattern the reference stores as
explicit neighbor lists, /root/reference/fea_test_sm_sym_sparse2.cu:72-100).
Storing the matrix as K offset-diagonals ``data [K, NN]`` turns SpMV into

    y = sum_k data[k] * shift(x, offset_k)

— K statically-shifted elementwise multiply-adds with **zero gathers and no
column-index array**, which roughly halves HBM traffic versus ELL and is the
speed-of-light SpMV shape on TPU (pure VPU streaming).  The same layout is
what the distributed halo-exchange matvec shards (tpufem.dist).

Works for any mesh whose (col - row) offsets take few distinct values:
structured rectangles (7 offsets) and Kuhn boxes (15 offsets).
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.mesh.adjacency import _unique_pairs

__all__ = ["StencilPattern", "stencil_pattern", "StencilMatrix",
           "stencil_matvec"]


@dataclasses.dataclass(frozen=True)
class StencilPattern:
    """offsets [K] int64 (sorted, includes 0); slots [NE, npe, npe] int32
    flat index k*NN + row for every local-matrix entry; diag_k: index of
    offset 0; perm/sorted_slots: sorted-assembly plan."""

    offsets: np.ndarray
    slots: np.ndarray
    perm: np.ndarray
    sorted_slots: np.ndarray
    diag_k: int
    num_rows: int

    @property
    def width(self) -> int:
        return self.offsets.shape[0]


def stencil_pattern(conn: np.ndarray, num_nodes: int,
                    max_offsets: int | None = None) -> StencilPattern:
    """Build the offset set and per-entry slots for stencil assembly.

    Raises if the mesh produces more than ``max_offsets`` distinct offsets
    (a signal the mesh is unstructured and ELL should be used instead).
    """
    npe = conn.shape[1]
    _, urows, ucols, keys = _unique_pairs(conn, num_nodes)
    offsets = np.unique(ucols - urows)
    if max_offsets is not None and offsets.size > max_offsets:
        raise ValueError(
            f"{offsets.size} distinct offsets (> {max_offsets}); "
            "mesh is not stencil-structured — use the ELL format")
    entry_rows = (keys // num_nodes).astype(np.int64)
    entry_cols = (keys % num_nodes).astype(np.int64)
    k_idx = np.searchsorted(offsets, entry_cols - entry_rows)
    slot_flat = k_idx * num_nodes + entry_rows
    slots = slot_flat.reshape(-1, npe, npe).astype(np.int64)
    perm = np.argsort(slot_flat, kind="stable")
    sorted_slots = slot_flat[perm]
    diag_k = int(np.searchsorted(offsets, 0))
    assert offsets[diag_k] == 0
    return StencilPattern(offsets=offsets, slots=slots, perm=perm,
                          sorted_slots=sorted_slots, diag_k=diag_k,
                          num_rows=num_nodes)


def stencil_matvec(data, offsets, x):
    """y[n] = sum_k data[k, n] * x[n + offsets[k]] via static shifts.

    offsets: static python sequence.  x is zero-padded by the max |offset|;
    every term is a dynamic_slice with a static start — no gather.
    """
    n = x.shape[0]
    halo = int(max(abs(int(o)) for o in offsets))
    xp = jnp.pad(x, (halo, halo))
    y = jnp.zeros_like(x)
    for k, off in enumerate(offsets):
        shifted = jax.lax.dynamic_slice(xp, (halo + int(off),), (n,))
        y = y + data[k] * shifted
    return y


@jax.tree_util.register_pytree_node_class
class StencilMatrix:
    """data [K, NN] offset-diagonal storage; offsets are static metadata."""

    def __init__(self, data, offsets):
        self.data = data
        self.offsets = tuple(int(o) for o in offsets)

    def tree_flatten(self):
        return (self.data,), self.offsets

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], aux)

    @property
    def shape(self):
        n = self.data.shape[1]
        return (n, n)

    @property
    def dtype(self):
        return self.data.dtype

    def matvec(self, x):
        return stencil_matvec(self.data, self.offsets, x)

    def __matmul__(self, x):
        return self.matvec(x)

    def diagonal(self):
        k0 = self.offsets.index(0)
        return self.data[k0]

    def to_dense(self):
        n = self.data.shape[1]
        A = jnp.zeros((n, n), self.data.dtype)
        rows = jnp.arange(n)
        for k, off in enumerate(self.offsets):
            cols = rows + off
            valid = (cols >= 0) & (cols < n)
            A = A.at[rows[valid], cols[valid]].add(self.data[k][valid])
        return A
