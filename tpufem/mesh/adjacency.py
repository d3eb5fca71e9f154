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

__all__ = ["node_adjacency", "ELLPattern", "ell_pattern",
           "greedy_element_coloring", "reverse_cuthill_mckee"]


def reverse_cuthill_mckee(cols: np.ndarray, *,
                          use_native: bool = True) -> np.ndarray:
    """Level-wise reverse Cuthill-McKee ordering from an ELL cols array.

    Returns ``perm`` with new index i holding old node ``perm[i]``; applying
    it clusters every row's neighbors near the diagonal, shrinking the
    matrix bandwidth to ~one mesh line — the precondition for the banded
    Pallas SpMV (tpufem.sparse.ell_pallas).

    BFS runs a whole level per step with vectorized frontier expansion
    (O(nnz) total), ordering each level by node degree — the standard
    level-set variant of CM; bandwidth matches classic CM on mesh graphs.
    Self-loop padding entries are ignored.  Handles disconnected components.
    """
    cols = np.asarray(cols)
    n, K = cols.shape
    if use_native:
        try:
            from tpufem import native
            if native.available():
                return native.reverse_cuthill_mckee(cols)
        except Exception:
            pass
    rows = np.repeat(np.arange(n, dtype=np.int64), K)
    c = cols.reshape(-1).astype(np.int64)
    m = rows != c                        # drop self/padding entries
    rows, c = rows[m], c[m]
    order_r = np.argsort(rows, kind="stable")
    rows, c = rows[order_r], c[order_r]
    deg = np.bincount(rows, minlength=n)
    row_start = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(deg, out=row_start[1:])

    def neighbors_of(frontier):
        counts = deg[frontier]
        total = int(counts.sum())
        if total == 0:
            return (np.empty(0, np.int64),) * 2
        offs = np.zeros(frontier.size, dtype=np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(offs, counts)
        idx = np.repeat(row_start[frontier], counts) + pos
        src = np.repeat(frontier, counts)          # edge sources
        return src, c[idx]

    def bfs_levels(start, visited):
        """Run one component's BFS; returns list of ordered levels."""
        frontier = np.array([start], dtype=np.int64)
        visited[start] = True
        levels = []
        while frontier.size:
            levels.append(frontier)
            src, nbrs = neighbors_of(frontier)
            fresh = ~visited[nbrs]
            src, nbrs = src[fresh], nbrs[fresh]
            if nbrs.size == 0:
                break
            # order the next level by (first parent's rank, degree) — the
            # classic CM tie-break that keeps the ordering snake-like
            pos = np.empty(n, dtype=np.int64)
            pos[frontier] = np.arange(frontier.size)
            rank = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(rank, nbrs, pos[src])
            frontier = np.unique(nbrs)
            order = np.lexsort((deg[frontier], rank[frontier]))
            frontier = frontier[order]
            visited[frontier] = True
        return levels

    visited = np.zeros(n, bool)
    out = np.empty(n, dtype=np.int64)
    filled = 0
    big = np.iinfo(np.int64).max
    deg_masked = deg.astype(np.int64).copy()
    while filled < n:
        # new component: pseudo-peripheral start (George-Liu iteration —
        # min-degree node of the deepest BFS level, repeated while the
        # eccentricity grows); shrinks level widths and hence bandwidth
        deg_masked[visited] = big
        start = int(np.argmin(deg_masked))
        depth = -1
        for _ in range(4):
            levels = bfs_levels(start, visited.copy())
            if len(levels) <= depth:
                break
            depth = len(levels)
            last = levels[-1]
            start = int(last[np.argmin(deg[last])])
        levels = bfs_levels(start, visited)
        for lvl in levels:
            out[filled:filled + lvl.size] = lvl
            filled += lvl.size
    return out[::-1].copy()


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


def ell_pattern(conn: np.ndarray, num_nodes: int, pad_to: int | None = None,
                with_sort_plan: bool = True) -> ELLPattern:
    """Build the ELL pattern and the full scatter plan for assembly.

    ``pad_to`` rounds the row width up (e.g. 8 in 2D, 16 in 3D) so the
    [NN, K] value array tiles cleanly onto the TPU's 8x128 vector lanes.

    ``with_sort_plan=False`` skips the argsort-based plan consumed only by
    ``assemble_ell(method="sort")``.

    One argsort of the flat (row, col) keys drives everything: the sorted
    run starts give the unique pattern, the inverse permutation gives
    every entry's slot WITHOUT a per-entry binary search, and — because
    slot order equals key order — the argsort IS the ``method="sort"``
    plan.  This replaced a quicksort ``np.unique`` + ``searchsorted``
    pair that dominated host setup at the 1M-row and 20M-element scales
    (BENCH_NOTES r3: 26 s / 86 s walls).  The sort is introsort (numpy
    default — measured 1.5x timsort on shuffled meshes): not stable, but
    deterministic, which is all the summation-order guarantee needs.
    """
    npe = conn.shape[1]
    if not with_sort_plan:
        # native row-counting-sort path: O(nnz) vs the global argsort
        # below (~160 s at 20M elements); the numpy path remains the
        # executable specification and the method="sort" plan provider
        try:
            from tpufem import native
            if native.available():
                guess = pad_to or (2 * npe + 2)
                cols, lengths, diag_pos, slots = native.ell_pattern2(
                    conn, num_nodes, width_guess=guess)
                K = cols.shape[1]
                if pad_to is not None and K % pad_to:
                    K = ((K + pad_to - 1) // pad_to) * pad_to
                    cols, lengths, diag_pos, slots = native.ell_pattern2(
                        conn, num_nodes, width_guess=K)
                # unique_keys reconstructs lazily (slots_for_conn is the
                # only consumer; materializing it here costs ~19 s / 1 GB
                # at 20M elements)
                return ELLPattern(
                    cols=cols, row_lengths=lengths, slots=slots,
                    perm=None, sorted_slots=None, diag_pos=diag_pos,
                    unique_keys=None,
                    nnz=int(lengths.astype(np.int64).sum()))
        except Exception:
            pass

    c64 = conn.astype(np.int64)
    keys = (np.broadcast_to(c64[:, :, None], (c64.shape[0], npe, npe))
            * num_nodes
            + c64[:, None, :]).reshape(-1)               # [NE*npe*npe]

    order = np.argsort(keys)
    skeys = keys[order]
    new_run = np.empty(skeys.size, bool)
    new_run[0] = True
    np.not_equal(skeys[1:], skeys[:-1], out=new_run[1:])
    unique_keys = skeys[new_run]
    urows = unique_keys // num_nodes
    ucols = unique_keys % num_nodes

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

    # Map every (element, i, j) entry to its flat ELL slot: entry -> rank in
    # the sorted order -> unique id (cumulative run count) -> within-row pos.
    uid = np.cumsum(new_run, dtype=np.int64) - 1         # [NE*npe*npe]
    u = np.empty(keys.size, dtype=np.int64)
    u[order] = uid
    entry_rows = keys // num_nodes
    slot_flat = entry_rows * K + (u - row_start[entry_rows])
    slots = slot_flat.reshape(-1, npe, npe).astype(np.int32)

    if with_sort_plan:
        # keys ascending == (row, col) lexicographic == slot_flat
        # ascending — exactly the plan the segment-sum assembly needs,
        # for free.  Within one slot the entry order is whatever the
        # (deterministic, unstable) introsort produced: fixed for a given
        # input, but NOT the element order — don't rely on it for
        # bitwise-reproducible goldens across numpy versions.
        perm = order
        sorted_slots = slot_flat[order].astype(np.int32)
    else:
        perm = sorted_slots = None

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


def pattern_unique_keys(pattern: ELLPattern) -> np.ndarray:
    """Sorted flat keys row*NN+col of the pattern's stored entries.

    Materialized lazily from cols/row_lengths (rows ascend; cols ascend
    within each row's real slots) — the native ell_pattern2 path skips
    storing them (ELLPattern.unique_keys is None there)."""
    if pattern.unique_keys is not None:
        return pattern.unique_keys
    nn, K = pattern.cols.shape
    real = np.arange(K)[None, :] < pattern.row_lengths[:, None]
    keys_2d = (np.arange(nn, dtype=np.int64)[:, None] * nn
               + pattern.cols.astype(np.int64))
    return keys_2d[real]


def slots_for_conn(pattern: ELLPattern, conn: np.ndarray) -> np.ndarray:
    """Flat ELL slot index for every (i, j) DOF pair of an extra
    connectivity (e.g. boundary facets) — all pairs must already exist in
    the pattern (facet node pairs always do: they co-occur in the owner
    element).  Returns [NC, n, n] int64 indices into data.reshape(-1)."""
    conn = np.asarray(conn, np.int64)
    nn, K = pattern.cols.shape
    unique_keys = pattern_unique_keys(pattern)
    row_start = np.zeros(nn + 1, dtype=np.int64)
    np.cumsum(pattern.row_lengths, out=row_start[1:])
    keys = (conn[:, :, None] * nn + conn[:, None, :]).reshape(-1)
    u = np.searchsorted(unique_keys, keys)
    if (u >= unique_keys.size).any() or not np.array_equal(
            unique_keys[np.minimum(
                u, unique_keys.size - 1)], keys):
        raise ValueError("connectivity pair missing from the ELL pattern")
    rows = keys // nn
    slots = rows * K + (u - row_start[rows])
    n = conn.shape[1]
    return slots.reshape(-1, n, n)
