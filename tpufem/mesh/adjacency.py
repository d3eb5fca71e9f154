"""Mesh adjacency, ELL sparsity patterns, and scatter precomputation.

The reference builds per-node sorted neighbor lists on the host with
std::set + sort (Mesh::getNeighborNodesList,
/root/reference/fea_test_sm_sym_sparse2.cu:72-100) and its device kernel then
*linear-searches* the column slot per entry before an atomicAdd
(/root/reference/fea_test_sm_sym_sparse2.cu:273-282).  On TPU both the search
and the atomics disappear: the sparsity pattern — and the exact ELL slot every
one of the NE*npe*npe local-matrix entries lands in — is precomputed here once
(vectorized numpy; a C++ native implementation lives in tpufem/native).  The
device then performs either

  * a single scatter-add with precomputed flat slot indices, or
  * a gather-by-permutation + sorted ``segment_sum`` (the canonical
    deterministic TPU replacement for atomicAdd scatter).

Both are pure data-parallel primitives XLA schedules at full HBM bandwidth.
"""
from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["node_adjacency", "ELLPattern", "ell_pattern", "greedy_element_coloring"]


def _unique_pairs(conn: np.ndarray, num_nodes: int):
    """Sorted unique (row, col) pairs of the FEM sparsity pattern.

    Every element couples all of its nodes pairwise (including self-pairs),
    exactly the pattern the reference accumulates per node
    (/root/reference/fea_test_sm_sym_sparse2.cu:77-86).
    """
    npe = conn.shape[1]
    c64 = conn.astype(np.int64)
    rows = np.repeat(c64, npe, axis=1).ravel()          # [NE*npe*npe]
    cols = np.tile(c64, (1, npe)).ravel()
    keys = rows * num_nodes + cols
    unique_keys = np.unique(keys)                        # sorted ascending
    urows = unique_keys // num_nodes
    ucols = unique_keys % num_nodes
    return unique_keys, urows, ucols, keys


def node_adjacency(conn: np.ndarray, num_nodes: int, max_length: int | None = None):
    """Per-node sorted neighbor lists, fixed width.

    Returns (lengths [NN] int32, indices [NN, K] int32).  Padding slots hold
    the node's own index so downstream gathers stay in-bounds (the reference
    leaves them uninitialized).  Parity: getNeighborNodesList,
    /root/reference/fea_test_sm_sym_sparse2.cu:72-100 (incl. self, sorted).
    """
    _, urows, ucols, _ = _unique_pairs(conn, num_nodes)
    lengths = np.bincount(urows, minlength=num_nodes).astype(np.int32)
    K = int(lengths.max()) if max_length is None else int(max_length)
    if lengths.max() > K:
        raise ValueError(
            f"max_length={K} smaller than max row degree {int(lengths.max())}"
        )
    row_start = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(lengths, out=row_start[1:])
    pos = np.arange(urows.size, dtype=np.int64) - row_start[urows]
    indices = np.repeat(
        np.arange(num_nodes, dtype=np.int32)[:, None], K, axis=1
    )
    indices[urows, pos] = ucols.astype(np.int32)
    return lengths, indices


@dataclasses.dataclass(frozen=True)
class ELLPattern:
    """Precomputed fixed-width (ELL) sparsity pattern + assembly scatter plan.

    Attributes
    ----------
    cols:        [NN, K] int32 column index per slot (padding = own row)
    row_lengths: [NN]    int32 true row degrees
    slots:       [NE, npe, npe] int32 flat slot index (gi*K + col position)
                 for every local-matrix entry — replaces the reference's
                 per-entry linear search
                 (/root/reference/fea_test_sm_sym_sparse2.cu:277-281)
    perm:        [NE*npe*npe] int64 permutation sorting entries by slot
    sorted_slots:[NE*npe*npe] int32 slot ids after permutation (ascending)
    diag_pos:    [NN] int32 within-row position of the diagonal entry
    unique_keys: [nnz] int64 sorted flat keys row*NN+col of stored entries
    nnz:         true number of stored entries
    """

    cols: np.ndarray
    row_lengths: np.ndarray
    slots: np.ndarray
    perm: np.ndarray
    sorted_slots: np.ndarray
    diag_pos: np.ndarray
    unique_keys: np.ndarray
    nnz: int

    @property
    def num_rows(self) -> int:
        return self.cols.shape[0]

    @property
    def width(self) -> int:
        return self.cols.shape[1]


def ell_pattern(conn: np.ndarray, num_nodes: int, pad_to: int | None = None
                ) -> ELLPattern:
    """Build the ELL pattern and the full scatter plan for assembly.

    ``pad_to`` rounds the row width up (e.g. 8 in 2D, 16 in 3D) so the
    [NN, K] value array tiles cleanly onto the TPU's 8x128 vector lanes.
    """
    npe = conn.shape[1]
    unique_keys, urows, ucols, keys = _unique_pairs(conn, num_nodes)
    lengths = np.bincount(urows, minlength=num_nodes).astype(np.int32)
    K = int(lengths.max())
    if pad_to is not None:
        K = max(K, 1)
        K = ((K + pad_to - 1) // pad_to) * pad_to
    row_start = np.zeros(num_nodes + 1, dtype=np.int64)
    np.cumsum(lengths, out=row_start[1:])

    cols = np.repeat(np.arange(num_nodes, dtype=np.int32)[:, None], K, axis=1)
    pos_in_row = np.arange(urows.size, dtype=np.int64) - row_start[urows]
    cols[urows, pos_in_row] = ucols.astype(np.int32)

    # Map every (element, i, j) entry to its flat ELL slot.
    u = np.searchsorted(unique_keys, keys)               # [NE*npe*npe]
    entry_rows = keys // num_nodes
    slot_flat = entry_rows * K + (u - row_start[entry_rows])
    slots = slot_flat.reshape(-1, npe, npe).astype(np.int32)

    perm = np.argsort(slot_flat, kind="stable")
    sorted_slots = slot_flat[perm].astype(np.int32)

    # Within-row position of the diagonal (self-pairs are always present).
    diag_keys = np.arange(num_nodes, dtype=np.int64) * (num_nodes + 1)
    diag_u = np.searchsorted(unique_keys, diag_keys)
    diag_pos = (diag_u - row_start[:-1]).astype(np.int32)

    return ELLPattern(
        cols=cols,
        row_lengths=lengths,
        slots=slots,
        perm=perm,
        sorted_slots=sorted_slots,
        diag_pos=diag_pos,
        unique_keys=unique_keys,
        nnz=int(unique_keys.size),
    )


def greedy_element_coloring(conn: np.ndarray, num_nodes: int) -> np.ndarray:
    """Color elements so no two same-colored elements share a node.

    Within one color, every local-matrix entry scatters to a distinct matrix
    slot, so a plain (non-atomic) accumulate is race-free — the TPU analogue
    of removing the reference's atomicAdd contention on shared nodes
    (/root/reference/fea_test.cu:246).  Vectorized greedy: in each round every
    node elects its lowest-id uncolored element; elements winning all their
    nodes take the round's color.

    Returns colors [NE] int32 (0-based).
    """
    ne, npe = conn.shape
    colors = np.full(ne, -1, dtype=np.int32)
    remaining = np.arange(ne)
    color = 0
    while remaining.size:
        winner = np.full(num_nodes, np.iinfo(np.int64).max, dtype=np.int64)
        sub = conn[remaining]
        np.minimum.at(winner, sub.ravel(), np.repeat(remaining, npe))
        wins = (winner[sub] == remaining[:, None]).all(axis=1)
        colors[remaining[wins]] = color
        remaining = remaining[~wins]
        color += 1
    return colors
