"""ctypes loader for the native host library (meshgen.cpp).

The reference's host layer is C++ (mesh classes, neighbor-list builder —
SURVEY.md §2.3); tpufem keeps that parity with a small C-ABI shared object
for the host-side hot loops (mesh generation, adjacency/ELL precompute).
Pure-numpy implementations in tpufem.mesh remain the fallback and the
executable specification.

Usage:
    from tpufem import native
    native.build_native()            # compile once (g++)
    if native.available():
        lengths, idx = native.node_adjacency(conn, nn)
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtpufem_native.so")
_lib: Optional[ctypes.CDLL] = None

_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


def build_native(force: bool = False) -> bool:
    """Compile the shared library with make/g++. Returns success.

    A pre-existing .so older than meshgen.cpp is rebuilt (a stale
    round-N-1 library would be missing newly added symbols)."""
    src = os.path.join(_DIR, "meshgen.cpp")
    if (os.path.exists(_SO) and not force
            and os.path.getmtime(_SO) >= os.path.getmtime(src)):
        return True
    try:
        subprocess.run(["make", "-C", _DIR, "-s", "-B"], check=True,
                       capture_output=True)
        return os.path.exists(_SO)
    except (subprocess.CalledProcessError, FileNotFoundError):
        # no toolchain (deploy box): a prebuilt .so is still usable —
        # _bind's symbol check below catches a genuinely stale library
        return os.path.exists(_SO)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build_native():
        return None
    try:
        lib = _bind(ctypes.CDLL(_SO))
    except (OSError, AttributeError):
        # stale library missing a symbol (or unloadable): one forced
        # rebuild, then give up -> available() returns False and every
        # caller falls back to the numpy paths instead of raising
        if not build_native(force=True):
            return None
        try:
            lib = _bind(ctypes.CDLL(_SO))
        except (OSError, AttributeError):
            return None
    _lib = lib
    return lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.tpufem_rectangle_mesh.argtypes = [
        ctypes.c_double] * 4 + [ctypes.c_int64] * 2 + [_f64p, _i32p, _i32p]
    lib.tpufem_rectangle_mesh.restype = None
    lib.tpufem_box_mesh.argtypes = [
        ctypes.c_double] * 6 + [ctypes.c_int64] * 3 + [_f64p, _i32p, _i32p]
    lib.tpufem_box_mesh.restype = None
    lib.tpufem_node_adjacency.argtypes = [
        _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, _i32p, ctypes.c_void_p]
    lib.tpufem_node_adjacency.restype = ctypes.c_int32
    lib.tpufem_ell_pattern.argtypes = [
        _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, _i32p, _i32p, _i32p]
    lib.tpufem_ell_pattern.restype = ctypes.c_int64
    lib.tpufem_rcm.argtypes = [_i32p, ctypes.c_int64, ctypes.c_int32,
                               np.ctypeslib.ndpointer(
                                   np.int64, flags="C_CONTIGUOUS")]
    lib.tpufem_rcm.restype = None
    lib.tpufem_greedy_aggregate.argtypes = [
        _i32p, ctypes.c_int64, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")]
    lib.tpufem_greedy_aggregate.restype = ctypes.c_int64
    lib.tpufem_ell_pattern2.argtypes = [
        _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.tpufem_ell_pattern2.restype = ctypes.c_int64
    lib.tpufem_galerkin_ell.argtypes = [
        _f64p, _i32p, ctypes.c_int64, ctypes.c_int32,
        _f64p, _i32p, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
    lib.tpufem_galerkin_ell.restype = ctypes.c_int64
    _blk_args = [
        _f64p, _i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        _f64p, _i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p]
    lib.tpufem_bspmm_bell.argtypes = _blk_args
    lib.tpufem_bspmm_bell.restype = ctypes.c_int64
    lib.tpufem_galerkin_bell.argtypes = _blk_args
    lib.tpufem_galerkin_bell.restype = ctypes.c_int64
    return lib


def available() -> bool:
    return _load() is not None


def rectangle_mesh(x0, x1, y0, y1, n_row, n_col):
    """Native structured rectangle mesh -> (coords, conn, flags)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    nn = (n_row + 1) * (n_col + 1)
    ne = 2 * n_row * n_col
    coords = np.empty((nn, 2), np.float64)
    conn = np.empty((ne, 3), np.int32)
    flags = np.empty(nn, np.int32)
    lib.tpufem_rectangle_mesh(x0, x1, y0, y1, n_row, n_col,
                              coords, conn, flags)
    return coords, conn, flags


def box_mesh(x0, x1, y0, y1, z0, z1, nx, ny, nz):
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    nn = (nx + 1) * (ny + 1) * (nz + 1)
    ne = 6 * nx * ny * nz
    coords = np.empty((nn, 3), np.float64)
    conn = np.empty((ne, 4), np.int32)
    flags = np.empty(nn, np.int32)
    lib.tpufem_box_mesh(x0, x1, y0, y1, z0, z1, nx, ny, nz,
                        coords, conn, flags)
    return coords, conn, flags


def node_adjacency(conn: np.ndarray, num_nodes: int,
                   max_length: int | None = None):
    """Native per-node neighbor lists (parity with
    tpufem.mesh.adjacency.node_adjacency)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    conn = np.ascontiguousarray(conn, np.int32)
    ne, npe = conn.shape
    lengths = np.empty(num_nodes, np.int32)
    if max_length is None:
        maxdeg = lib.tpufem_node_adjacency(conn, ne, npe, num_nodes, 0,
                                           lengths, None)
        max_length = int(maxdeg)
    indices = np.empty((num_nodes, max_length), np.int32)
    got = lib.tpufem_node_adjacency(
        conn, ne, npe, num_nodes, max_length, lengths,
        indices.ctypes.data_as(ctypes.c_void_p))
    if got > max_length:
        raise ValueError(f"max_length={max_length} < max degree {got}")
    return lengths, indices


def ell_pattern(conn: np.ndarray, num_nodes: int, width: int):
    """Native ELL cols/diag/slots. Returns (nnz, cols, diag_pos, slots)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    conn = np.ascontiguousarray(conn, np.int32)
    ne, npe = conn.shape
    cols = np.empty((num_nodes, width), np.int32)
    diag = np.empty(num_nodes, np.int32)
    slots = np.empty((ne, npe, npe), np.int32)
    nnz = lib.tpufem_ell_pattern(conn, ne, npe, num_nodes, width,
                                 cols, diag, slots)
    if nnz < 0:
        raise ValueError(f"width {width} smaller than max row degree")
    return int(nnz), cols, diag, slots


def greedy_aggregate(cols: np.ndarray):
    """Native two-pass greedy aggregation (partition parity with
    tpufem.solve.amg.greedy_aggregate; ids are raw creation order — the
    caller renumbers).  Returns (agg [n] int64, n_agg)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    cols = np.ascontiguousarray(cols, np.int32)
    n, k = cols.shape
    agg = np.empty(n, np.int64)
    na = lib.tpufem_greedy_aggregate(cols, n, k, agg)
    return agg, int(na)


def ell_pattern2(conn: np.ndarray, num_nodes: int, width_guess: int = 8):
    """Native ELL pattern + scatter slots via row counting sort (O(nnz);
    the numpy argsort path costs ~160 s at 20M elements).  Returns
    (cols [nn, K] int32, lengths [nn] int32, diag_pos [nn] int32,
    slots [ne, npe, npe] int32) with K >= the true max row degree."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    conn = np.ascontiguousarray(conn, np.int32)
    ne, npe = conn.shape
    W = max(int(width_guess), 1)
    for _ in range(4):
        cols = np.empty((num_nodes, W), np.int32)
        lengths = np.empty(num_nodes, np.int32)
        diag = np.empty(num_nodes, np.int32)
        slots = np.empty((ne, npe, npe), np.int32)
        need = lib.tpufem_ell_pattern2(
            conn, ne, npe, num_nodes, W,
            cols.ctypes.data_as(ctypes.c_void_p),
            lengths.ctypes.data_as(ctypes.c_void_p),
            diag.ctypes.data_as(ctypes.c_void_p),
            slots.ctypes.data_as(ctypes.c_void_p))
        if need < 0:
            raise ValueError("ell_pattern2: ne*npe^2 exceeds int32 range")
        if need <= W:
            return cols, lengths, diag, slots
        W = int(need)
    raise RuntimeError("ell_pattern2 width did not converge")


def galerkin_ell(a_data: np.ndarray, a_cols: np.ndarray,
                 p_data: np.ndarray, p_cols: np.ndarray, nc: int,
                 width_guess: int = 0):
    """Native A_c = P^T A P over zero-padded ELL operands (the AMG setup
    hot loop; parity with the chunked numpy product in tpufem.solve.amg).
    Returns (c_data [nc, W] float64, c_cols [nc, W] int32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    a_data = np.ascontiguousarray(a_data, np.float64)
    a_cols = np.ascontiguousarray(a_cols, np.int32)
    p_data = np.ascontiguousarray(p_data, np.float64)
    p_cols = np.ascontiguousarray(p_cols, np.int32)
    if a_data.shape != a_cols.shape or p_data.shape != p_cols.shape:
        raise ValueError("data/cols shape mismatch")
    if a_data.shape[0] != p_data.shape[0]:
        raise ValueError("A and P row counts differ")
    n, K = a_data.shape
    Kp = p_data.shape[1]
    W = int(width_guess) or max(4 * K, 24)
    for _ in range(3):
        c_data = np.empty((nc, W), np.float64)
        c_cols = np.empty((nc, W), np.int32)
        need = lib.tpufem_galerkin_ell(
            a_data, a_cols, n, K, p_data, p_cols, Kp, nc, W,
            c_data.ctypes.data_as(ctypes.c_void_p),
            c_cols.ctypes.data_as(ctypes.c_void_p))
        if need <= W:
            return c_data, c_cols
        W = int(need)
    raise RuntimeError("galerkin_ell width did not converge")


def _check_block_operands(a_data, a_cols, p_data, p_cols):
    a_data = np.ascontiguousarray(a_data, np.float64)
    a_cols = np.ascontiguousarray(a_cols, np.int32)
    p_data = np.ascontiguousarray(p_data, np.float64)
    p_cols = np.ascontiguousarray(p_cols, np.int32)
    if a_data.shape[:2] != a_cols.shape or p_data.shape[:2] != p_cols.shape:
        raise ValueError("block data/cols shape mismatch")
    if a_data.shape[0] != p_data.shape[0]:
        raise ValueError("A and P row counts differ")
    if a_data.shape[2] != a_data.shape[3] or a_data.shape[3] != p_data.shape[2]:
        raise ValueError("block dims incompatible (A [n,K,b,b], P [n,Kp,b,m])")
    return a_data, a_cols, p_data, p_cols


def bspmm_bell(a_data: np.ndarray, a_cols: np.ndarray,
               p_data: np.ndarray, p_cols: np.ndarray, nc: int,
               width_guess: int = 0):
    """Native blocked SpMM C = A @ P over zero-padded block-ELL operands
    (parity with tpufem.solve.amg_block._bspmm, the numpy spec).
    A [n,K,b,b]/[n,K], P [n,Kp,b,m]/[n,Kp] -> (c_data [n,W,b,m], c_cols)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    a_data, a_cols, p_data, p_cols = _check_block_operands(
        a_data, a_cols, p_data, p_cols)
    n, K, b, _ = a_data.shape
    Kp, m = p_data.shape[1], p_data.shape[3]
    W = int(width_guess) or max(2 * K, 16)
    for _ in range(3):
        c_data = np.empty((n, W, b, m), np.float64)
        c_cols = np.empty((n, W), np.int32)
        need = lib.tpufem_bspmm_bell(
            a_data.reshape(-1), a_cols, n, K, b,
            p_data.reshape(-1), p_cols, Kp, m, nc, W,
            c_data.ctypes.data_as(ctypes.c_void_p),
            c_cols.ctypes.data_as(ctypes.c_void_p))
        if need <= W:
            return c_data, c_cols
        W = int(need)
    raise RuntimeError("bspmm_bell width did not converge")


def galerkin_bell(a_data: np.ndarray, a_cols: np.ndarray,
                  p_data: np.ndarray, p_cols: np.ndarray, nc: int,
                  width_guess: int = 0):
    """Native blocked Galerkin A_c = P^T A P (block analogue of
    galerkin_ell; parity with amg_block's _bspmm + _bspmm_t numpy spec).
    Returns (c_data [nc, W, m, m] float64, c_cols [nc, W] int32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    a_data, a_cols, p_data, p_cols = _check_block_operands(
        a_data, a_cols, p_data, p_cols)
    n, K, b, _ = a_data.shape
    Kp, m = p_data.shape[1], p_data.shape[3]
    W = int(width_guess) or max(4 * K, 24)
    for _ in range(3):
        c_data = np.empty((nc, W, m, m), np.float64)
        c_cols = np.empty((nc, W), np.int32)
        need = lib.tpufem_galerkin_bell(
            a_data.reshape(-1), a_cols, n, K, b,
            p_data.reshape(-1), p_cols, Kp, m, nc, W,
            c_data.ctypes.data_as(ctypes.c_void_p),
            c_cols.ctypes.data_as(ctypes.c_void_p))
        if need <= W:
            return c_data, c_cols
        W = int(need)
    raise RuntimeError("galerkin_bell width did not converge")


def reverse_cuthill_mckee(cols: np.ndarray) -> np.ndarray:
    """Native level-set RCM (exact parity with
    tpufem.mesh.adjacency.reverse_cuthill_mckee; ~10x faster at 1M rows)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run build_native())")
    cols = np.ascontiguousarray(cols, np.int32)
    n, k = cols.shape
    perm = np.empty(n, np.int64)
    lib.tpufem_rcm(cols, n, k, perm)
    return perm
