"""Smoothed-aggregation algebraic multigrid for unstructured ELL systems.

The reference stops at assembling its unstructured ELL matrix
(/root/reference/fea_test_sm_sym_sparse2.cu:273-282 — no solver exists).
tpufem's geometric multigrid (solve/multigrid.py) needs exactly nested
structured grids; Chebyshev-Jacobi (solve/precond.py) is mesh-robust-ish
but its iteration count still grows with the mesh.  This module is the
mesh-independent preconditioner for general unstructured systems
(VERDICT.md r2 item 5, the "ambitious" option): classical smoothed
aggregation (Vanek/Mandel/Brezina '96) with all setup on the host in
vectorized numpy (+ a native C++ fast path for the one sequential loop)
and the entire V-cycle on device.

TPU-first design decisions:

* **Two aggregation modes, both band-preserving.**  ``interval`` (the TPU
  default choice at scale): fixed-stride contiguous aggregates along the
  RCM line — the prolongator becomes P = (I - omega D^-1 A) T with T a
  stride-``s`` window operator, so BOTH transfer applications are
  repeat/pad/reshape + one banded SpMV: the V-cycle contains zero
  gathers.  ``greedy`` (classical Vanek): better-shaped aggregates,
  slightly fewer iterations, but P/P^T apply as ELL gathers — the op TPU
  is worst at.  See tests/test_amg.py for measured iteration counts of
  both modes; at scale the gather cost dominates the cycle, so interval
  is the performant choice even where it costs a few more iterations.

* **Greedy graph aggregation, aggregates ordered by minimum fine index.**
  Pass 1 seeds an aggregate at every node whose whole neighborhood is
  free; pass 2 attaches leftovers to the pass-1 aggregate most common
  among their neighbors (Vanek's standard two-pass).  Because the fine
  matrix is RCM-ordered (the banded-SpMV precondition), numbering the
  aggregates by their first fine node makes every coarse operator inherit
  the band: coarse bandwidth ~ fine bandwidth / aggregate size.  No
  second RCM pass is needed, every level's SpMV auto-dispatches to the
  banded Pallas kernel, and the prolongator columns track ``row /
  aggregate_size`` — the precondition for a rectangular banded transfer
  kernel.
* **Host Galerkin setup, device cycle.**  P = (I - omega D^-1 A) T and
  A_c = P^T A P are irregular sparse-sparse products — scatter-heavy,
  wrong for the MXU — computed once on the host with chunked vectorized
  numpy (sort + reduceat, no per-entry Python loops), then shipped as
  concrete ELL device arrays.  The V-cycle itself is pure jit: banded
  SpMVs, Chebyshev polynomial smoothers (fixed coefficients), and a dense
  MXU matmul with the explicit coarsest-level inverse.
* **SPD by construction.**  The symmetric V(1,1) cycle with identical
  symmetric polynomial pre/post smoothers, Galerkin coarse operators, and
  exact coarsest solve is a fixed symmetric positive definite operator,
  hence a valid CG preconditioner.

Intended use at scale: pass the hierarchy THROUGH the jit boundary as an
argument (``solve(b, hier)`` with ``M=hier.apply`` inside).  AMGLevel /
AMGHierarchy are registered pytrees whose scalar config rides aux_data and
whose ELLMatrix leaves keep their banded Pallas plans across the boundary
(sparse/ell.py pytree protocol), so the operators arrive as runtime
parameters instead of being baked into the lowered HLO as constants —
closure capture at 1M rows costs ~300 MB of module constants, minutes of
lowering, and exceeds the compile relay's request limit (BENCH_NOTES r4).
Closing over the hierarchy still works and is fine at small sizes.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.sparse.ell import ELLMatrix, ell_matvec, ell_matvec_multi

__all__ = ["AMGLevel", "AMGHierarchy", "build_amg", "greedy_aggregate"]


# -- aggregation ----------------------------------------------------------------

def greedy_aggregate(cols: np.ndarray, *, use_native: bool = True):
    """Two-pass greedy aggregation over an ELL adjacency pattern.

    Returns ``(agg, n_agg)``: aggregate id per node, ids numbered by first
    (minimum) member node so an RCM-ordered input yields band-preserving
    coarse numbering.  Pass 1: any node whose entire neighborhood is
    unaggregated seeds an aggregate containing itself + neighbors.  Pass 2
    attaches the rest to the pass-1 aggregate most frequent among their
    neighbors (ties: smallest id); isolated leftovers become singletons.
    The numpy loop is the executable specification; the native C++ version
    (tpufem/native/meshgen.cpp:tpufem_greedy_aggregate) is exact parity.
    """
    cols = np.asarray(cols, np.int32)
    n, K = cols.shape
    if use_native:
        try:
            from tpufem import native
            if native.available():
                agg, na = native.greedy_aggregate(cols)
                return _renumber_by_first(agg, na, n)
        except Exception:
            pass
    agg = np.full(n, -1, np.int64)
    na = 0
    for i in range(n):                      # pass 1
        if agg[i] != -1:
            continue
        nb = cols[i]
        nb = nb[nb != i]
        if (agg[nb] != -1).any():
            continue
        agg[i] = na
        agg[nb] = na
        na += 1
    pass1 = agg.copy()
    for i in range(n):                      # pass 2 (reads pass-1 state)
        if agg[i] != -1:
            continue
        nb = cols[i]
        nbagg = pass1[nb[nb != i]]
        nbagg = nbagg[nbagg != -1]
        if nbagg.size:
            ids, cnt = np.unique(nbagg, return_counts=True)
            agg[i] = ids[np.argmax(cnt)]    # unique is sorted: ties -> min
        else:
            agg[i] = na                     # isolated: singleton
            na += 1
    return _renumber_by_first(agg, na, n)


def merge_isolated_singletons(agg, nc, iso, group: int = 16,
                              span: Optional[int] = None):
    """Group decoupled singleton rows into positional aggregates.

    Symmetric Dirichlet elimination leaves constrained rows with NO
    off-diagonal coupling; greedy aggregation then makes each a pass-2
    singleton at EVERY level, so the ~4*sqrt(n) boundary rows of a 2D
    mesh never coarsen and eventually dominate the hierarchy (measured:
    the 491k-DOF scalar coarsest was 2833 rows of which 2800 were the
    boundary; the 982k-DOF block coarsest 10506 blocks / 319 s dense
    factorization — BENCH_NOTES r5 phases E1/E3).  Isolated rows carry
    no coupling at all, so ANY grouping is spectrally exact: coarse
    entries between group members are zero and the group's Galerkin
    diagonal stays identity-like.

    Groups follow the (RCM) row order AND are span-capped: boundary
    rows are ~bandwidth-spaced along an RCM order, so an unbounded
    group would stretch over group*bw fine rows — the embedded
    restriction Qr then carries the whole group in its first-member ROW
    (K += group) with bandwidth = the group span, which blew the b=3
    BCSR kernel's VMEM at 982k DOFs (94.5 MB window, hw r5 phase F1).
    ``span`` bounds last-first within a group (callers pass ~2x the
    level bandwidth); ``group`` bounds the member count (K growth).

    ``iso``: bool [n], rows with no nonzero off-diagonal entry.
    Returns the (compacted, renumbered-by-first) ``(agg, n_agg)``.
    """
    nloc = agg.shape[0]
    sizes = np.bincount(agg, minlength=nc)
    idx = np.nonzero(iso & (sizes[agg] == 1))[0]
    if idx.size < 2:
        return agg, nc
    span = int(span) if span is not None else nloc
    agg = np.asarray(agg).copy()
    gstart = idx[0]
    count = 0
    target = np.empty(idx.size, dtype=np.int64)
    for t, i in enumerate(idx):
        if count >= int(group) or i - gstart > span:
            gstart, count = i, 0
        target[t] = gstart
        count += 1
    agg[idx] = agg[target]                   # group takes 1st member's id
    uniq, agg = np.unique(agg, return_inverse=True)
    return _renumber_by_first(agg.astype(np.int64), uniq.size, nloc)


def sym_dense_inv(dense: np.ndarray) -> np.ndarray:
    """Inverse (or pseudo-inverse) of a dense symmetric matrix, on host.

    Cholesky-based (LAPACK dpotrf/dpotri, ~2n^3/3 flops) when the matrix
    is positive definite — measured 2.4 s vs np.linalg.eigh's 16.5 s at
    n=4000 on one host core, and the block-AMG coarsest at 982k DOFs paid
    393.9 s in eigh (BENCH_NOTES r5 phase C1) — with an eigh pseudo-inverse
    fallback when the coarsest carries a (near-)null space (stalled
    coarsening, pure-Neumann blocks).  Returns an exactly symmetric array.
    """
    dense = 0.5 * (dense + dense.T)
    try:
        from scipy.linalg import lapack
        c, info = lapack.dpotrf(dense, lower=1)
        if info == 0:
            inv, info = lapack.dpotri(c, lower=1)
            if info == 0:
                inv = np.tril(inv) + np.tril(inv, -1).T
                if np.isfinite(inv).all():
                    return inv
    except ImportError:
        pass
    w, V = np.linalg.eigh(dense)
    cut = np.abs(w).max() * max(dense.shape[0], 1) * np.finfo(np.float64).eps
    winv = np.where(np.abs(w) > cut, 1.0 / np.where(w != 0.0, w, 1.0), 0.0)
    return (V * winv) @ V.T


def _renumber_by_first(agg, na, n):
    """Renumber aggregate ids by minimum member node.  Any id assignment
    with the same partition normalizes to the same result, so the native
    and numpy paths agree bit-for-bit; on RCM input the coarse numbering
    then sweeps the band in fine order (band-preserving)."""
    first = np.full(na, n, np.int64)
    np.minimum.at(first, agg, np.arange(n, dtype=np.int64))
    order = np.argsort(first, kind="stable")
    rank = np.empty(na, np.int64)
    rank[order] = np.arange(na, dtype=np.int64)
    return rank[agg], na


# -- host-side sparse helpers (numpy, vectorized) -------------------------------

def _coo_dedup(rows, cols, vals, ncols):
    """Sum duplicate (row, col) COO entries.  Returns sorted (r, c, v)."""
    key = rows.astype(np.int64) * np.int64(ncols) + cols
    order = np.argsort(key, kind="stable")
    key = key[order]
    vals = vals[order]
    first = np.empty(key.shape, bool)
    first[0] = True
    np.not_equal(key[1:], key[:-1], out=first[1:])
    starts = np.flatnonzero(first)
    v = np.add.reduceat(vals, starts)
    k = key[starts]
    return (k // ncols).astype(np.int64), (k % ncols).astype(np.int64), v


def _coo_to_ell(rows, cols, vals, nrows, pad_cols=None):
    """(row-sorted, deduped) COO -> ELL data [n, K] / cols [n, K].

    Padding slots point at ``pad_cols[i]`` (default: own row) with value 0
    — the gather matvec needs no mask.  Real entries fill slots 0..len-1,
    so a row's first ``cols == row`` hit is always the real diagonal.
    """
    counts = np.bincount(rows, minlength=nrows).astype(np.int64)
    K = max(1, int(counts.max()))
    starts = np.zeros(nrows + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    pos = np.arange(rows.size, dtype=np.int64) - starts[rows]
    if pad_cols is None:
        pad_cols = np.arange(nrows, dtype=np.int64)
    data = np.zeros((nrows, K), vals.dtype)
    ell_cols = np.broadcast_to(pad_cols[:, None], (nrows, K)).copy()
    data[rows, pos] = vals
    ell_cols[rows, pos] = cols
    return data, ell_cols.astype(np.int32)


def _ell_to_coo(data, cols):
    """ELL -> COO, dropping zero-valued entries except the diagonal."""
    n, K = data.shape
    rows = np.repeat(np.arange(n, dtype=np.int64), K)
    c = cols.astype(np.int64).ravel()
    v = data.ravel()
    keep = (v != 0) | (rows == c)   # padding aliases diag with 0: dedup sums
    return rows[keep], c[keep], v[keep]


def _spmm_ell_coo(a_data, a_cols, p_data, p_cols, n_coarse, chunk):
    """C = A @ P for A, P in zero-padded ELL; returns deduped COO of C.

    Triplet expansion per fine-row chunk: N*K*Kp raw triplets, deduped
    chunkwise to bound memory; chunks own disjoint row ranges so the
    concatenation stays deduped and row-sorted.
    """
    n = a_data.shape[0]
    out = []
    for s in range(0, n, chunk):
        e = min(n, s + chunk)
        ad = a_data[s:e]                      # [m, K]
        ac = a_cols[s:e].astype(np.int64)     # [m, K]
        pd = p_data[ac]                       # [m, K, Kp]
        pc = p_cols[ac].astype(np.int64)      # [m, K, Kp]
        kkp = ad.shape[1] * pd.shape[2]
        vals = (ad[:, :, None] * pd).ravel()
        rows = np.repeat(np.arange(s, e, dtype=np.int64), kkp)
        cols = pc.ravel()
        keep = vals != 0
        keep[::kkp] = True                    # keep every row alive
        out.append(_coo_dedup(rows[keep], cols[keep], vals[keep], n_coarse))
    return (np.concatenate([o[0] for o in out]),
            np.concatenate([o[1] for o in out]),
            np.concatenate([o[2] for o in out]))


def _spmm_t_coo(p_data, p_cols, c_rows, c_cols, c_vals, n_coarse, chunk):
    """G = P^T @ C for P in zero-padded ELL and C in row-sorted COO."""
    parts = []
    m = c_rows.size
    Kp = p_data.shape[1]
    for s in range(0, m, chunk):
        e = min(m, s + chunk)
        ci = c_rows[s:e]
        w = p_data[ci]                        # [mm, Kp]
        a = p_cols[ci].astype(np.int64)       # [mm, Kp]
        vals = (c_vals[s:e, None] * w).ravel()
        rows = a.ravel()
        cols = np.repeat(c_cols[s:e], Kp)
        keep = vals != 0
        keep[::Kp] = True
        parts.append(_coo_dedup(rows[keep], cols[keep], vals[keep],
                                n_coarse))
    r = np.concatenate([p[0] for p in parts])
    c = np.concatenate([p[1] for p in parts])
    v = np.concatenate([p[2] for p in parts])
    return _coo_dedup(r, c, v, n_coarse)


# -- hierarchy ------------------------------------------------------------------

class AMGLevel(NamedTuple):
    A: ELLMatrix            # level operator (banded ELL, auto Pallas)
    inv_diag: jax.Array     # 1 / diag(A)
    lmax: float             # Gershgorin bound on spec(D^-1 A)
    p_data: jax.Array       # prolongator ELL values   [n_f, Kp]   (greedy)
    p_cols: jax.Array       # prolongator ELL columns  [n_f, Kp]   (greedy)
    r_data: jax.Array       # restriction (= P^T) ELL values [n_c, Kr] (greedy)
    r_cols: jax.Array       # restriction ELL columns        [n_c, Kr] (greedy)
    # interval (fixed-stride contiguous) aggregation fast path: transfers
    # become repeat/reshape + one banded SpMV — no gathers anywhere.
    s: int = 0              # aggregate stride (0 = greedy/gather transfers)
    tv: jax.Array = None    # [n_f] tentative scales 1/sqrt(|agg|)
    omega: float = 0.0      # prolongator smoothing weight
    # greedy + banded-embedded transfers: the rectangular P [n_f, n_c] is
    # embedded as a SQUARE banded matrix Q (column c of P lands at column
    # emb[c] = first fine member of aggregate c — strictly increasing by
    # min-index numbering, so Q's bandwidth ~ fine bandwidth + aggregate
    # span).  Transfers = banded square SpMV + one sorted 1-D gather /
    # scatter of the length-n_c coarse vector — the O(n_f * Kp) transfer
    # gathers of the legacy path collapse to O(n_c).
    Qp: ELLMatrix = None    # embedded prolongator  [n_f, n_f]
    Qr: ELLMatrix = None    # embedded restriction  [n_f, n_f]
    emb: jax.Array = None   # [n_c] int32, first fine member per aggregate
    # interval diag-folded transfer operators: the tv/omega/inv_diag
    # scalings of the matrix-free interval transfers are pre-multiplied
    # into operator copies (float64 on the host), so each transfer is
    # ONE banded SpMV instead of a SpMV plus ~7 HBM vector passes:
    #   restrict: w = Rop @ res;  prolong: x = Pop @ upsample(xc)
    # with Rop = diag(tv) - omega diag(tv) A diag(inv_d),
    #      Pop = diag(tv)... transposed smoothing: (I - omega D^-1 A) diag(tv)
    Rop: ELLMatrix = None
    Pop: ELLMatrix = None


class AMGHierarchy(NamedTuple):
    levels: tuple           # tuple[AMGLevel], fine -> coarse
    coarse_inv: jax.Array   # dense inverse of the coarsest operator
    smoother_degree: int
    smoother_ratio: float
    operator_complexity: float   # sum(nnz of all A_l) / nnz(A_0)
    gamma: int = 1          # coarse visits per cycle: 1 = V-cycle, 2 = W

    def apply(self, r):
        """z = V-cycle(r): SPD preconditioner application.  Either close a
        jitted solve over the concrete hierarchy, or — preferred at scale —
        pass the hierarchy THROUGH the jit boundary as an argument (it is
        a registered pytree whose static config rides aux_data): argument
        operators stay out of the lowered HLO, closure operators are baked
        in as constants (~100s of MB at 1M rows; BENCH_NOTES r4)."""
        return _vcycle(self, 0, r)

    def __call__(self, r):
        return self.apply(r)

    def apply_multi(self, R):
        """Z = V-cycle(R) column-wise for R [n, q] — the multi-RHS cycle
        (one matrix stream per level visit for all q columns).  Same
        linear, SPD operator as ``apply`` on each column; feeds
        cg_fixed_block / eigen's batched inner solves as ``M_multi``."""
        return _vcycle_multi(self, 0, R)


# Custom pytree registration (overrides the NamedTuple default): array
# fields are children; scalar config is aux_data, so it stays STATIC when
# a hierarchy crosses a jit boundary.  The defaults would turn `s` /
# `gamma` / `smoother_degree` into tracers — all three drive Python-level
# control flow (reshape sizes, recursion depth, loop trip counts) and must
# be compile-time constants; `lmax`/`omega`/ratios fold into the Chebyshev
# coefficients on the host.
def _amg_level_flatten(lv: AMGLevel):
    children = (lv.A, lv.inv_diag, lv.p_data, lv.p_cols, lv.r_data,
                lv.r_cols, lv.tv, lv.Qp, lv.Qr, lv.emb, lv.Rop, lv.Pop)
    return children, (lv.s, lv.lmax, lv.omega)


def _amg_level_unflatten(aux, ch):
    s, lmax, omega = aux
    return AMGLevel(A=ch[0], inv_diag=ch[1], lmax=lmax, p_data=ch[2],
                    p_cols=ch[3], r_data=ch[4], r_cols=ch[5], s=s,
                    tv=ch[6], omega=omega, Qp=ch[7], Qr=ch[8], emb=ch[9],
                    Rop=ch[10], Pop=ch[11])


def _amg_hier_flatten(h: AMGHierarchy):
    return ((h.levels, h.coarse_inv),
            (h.smoother_degree, h.smoother_ratio, h.operator_complexity,
             h.gamma))


def _amg_hier_unflatten(aux, ch):
    return AMGHierarchy(levels=ch[0], coarse_inv=ch[1],
                        smoother_degree=aux[0], smoother_ratio=aux[1],
                        operator_complexity=aux[2], gamma=aux[3])


jax.tree_util.register_pytree_node(AMGLevel, _amg_level_flatten,
                                   _amg_level_unflatten)
jax.tree_util.register_pytree_node(AMGHierarchy, _amg_hier_flatten,
                                   _amg_hier_unflatten)


def _prime_wide(M: ELLMatrix, cols_np, segment: bool = True):
    """Resolve M's banded Pallas plan NOW — wide bands included.

    Every hierarchy matrix must have its plan built at SETUP time: the
    hierarchy crosses jit boundaries as a pytree argument (BENCH_NOTES
    r4), and inside the trace cols are tracers, so the lazy auto-dispatch
    can no longer measure the bandwidth and silently rides the ~500x
    slower gather.  That was the round-4 hardware pathology (472 ms per
    V-cycle at 1M rows vs ~1.5 ms of banded SpMV work): Qp/Qr and the
    coarse operators sit UNDER the auto cap, were skipped by the old
    over-cap-only priming, and hit the tracer fallback every cycle.

    Under-cap matrices resolve via the automatic policy; over-cap ones
    are primed unconditionally.  Honors the TPUFEM_BAND_DISPATCH=0
    escape.  TPU only: on other backends the banded kernel runs
    interpreted (~30x slower than the gather it would replace)."""
    import os as _os
    from tpufem.sparse.ell import _AUTO_BAND_MAX
    if M._band != "unresolved":
        return                    # caller already primed/pinned
    if _os.environ.get("TPUFEM_BAND_DISPATCH", "1") == "0":
        return
    if jax.default_backend() != "tpu":
        return
    n = cols_np.shape[0]
    bw = int(np.abs(cols_np.astype(np.int64)
                    - np.arange(n, dtype=np.int64)[:, None]).max())
    if bw > _AUTO_BAND_MAX:
        try:
            M.prime_band_plan(segment=segment)
        except Exception:
            pass                  # fall back to gather (still correct)
    elif segment:
        M.resolve_band()
    else:
        # coarse-level operators: single-global-kernel plan — their
        # matvecs are emitted 2^l times into an unrolled W-cycle, and the
        # per-segment Pallas payloads dominated executable size (262 MB /
        # 358 s server compile for interval-V at 501k rows, hw r5).
        # Runtime cost is a few extra gather rounds on levels that carry
        # ~1/s^2 of the work.
        from tpufem.sparse.ell_pallas import auto_block_rows
        try:
            M.prime_band_plan(
                auto_block_rows(bw, n, cols_np.shape[1]), segment=False)
        except Exception:
            M.resolve_band()


def _diag_of(data, cols):
    """Row diagonal, robust to zero-valued padding aliasing it."""
    n = data.shape[0]
    return np.where(cols == np.arange(n, dtype=np.int64)[:, None],
                    data, 0.0).sum(1)


def _cheb_coeffs(degree, lmax, ratio):
    """rho recurrence of the Chebyshev smoother (host floats)."""
    lmin = lmax / ratio
    theta = 0.5 * (lmax + lmin)
    delta = 0.5 * (lmax - lmin)
    sigma1 = theta / delta
    rhos = []
    rho = 1.0 / sigma1
    for _ in range(degree):
        rhos.append(rho)
        rho = 1.0 / (2.0 * sigma1 - rho)
    return theta, delta, rhos


def _cheb_smooth(mv, inv_d, lmax, degree, ratio, r0):
    """z ~ A^-1 r0 by the degree-m Chebyshev polynomial in D^-1 A.

    Identical recurrence to solve.precond.chebyshev, but the interval only
    reaches down to lmax/ratio — coarse levels own everything below.
    Fixed coefficients -> linear, symmetric, positive on the interval.
    ``mv`` is any matvec closure — the distributed cycle (dist.amg)
    passes its halo-exchange SpMV here.
    """
    theta, delta, rhos = _cheb_coeffs(degree, lmax, ratio)
    d = (inv_d * r0) / theta
    z = d
    r = r0
    for k in range(1, degree):
        r = r - mv(d)
        d = rhos[k] * rhos[k - 1] * d + (2.0 * rhos[k] / delta) * (inv_d * r)
        z = z + d
    return z


def _smooth(level: AMGLevel, degree, ratio, r0):
    return _cheb_smooth(level.A.matvec, level.inv_diag, level.lmax,
                        degree, ratio, r0)


def _smooth_multi(level: AMGLevel, degree, ratio, R0):
    """Multi-RHS Chebyshev smoothing: same recurrence on [n, q] blocks.
    ``inv_diag`` enters pre-broadcast so _cheb_smooth's elementwise algebra
    is shape-agnostic; the matvec rides the multi-RHS banded kernel (one
    matrix read per row-block for all q columns)."""
    return _cheb_smooth(level.A.matvec_multi, level.inv_diag[:, None],
                        level.lmax, degree, ratio, R0)


def _restrict(lv: AMGLevel, res):
    """rc = P^T res.

    Interval mode: P^T = T^T (I - omega A D^-1) (A symmetric), and T^T is
    a fixed-stride window sum — pad + reshape + sum, zero gathers; the one
    SpMV rides the banded Pallas kernel.

    Embedded-greedy mode: P^T res = (Qr res)[emb] — one square banded SpMV
    + a sorted 1-D gather of the length-n_c coarse vector.
    """
    if lv.emb is not None:
        return lv.Qr.matvec(res)[lv.emb]
    if lv.s == 0:
        return ell_matvec(lv.r_data, lv.r_cols, res)
    if lv.Rop is not None:
        w = lv.Rop.matvec(res)          # diag-folded: one banded SpMV
    else:
        w = lv.tv * (res - lv.omega * lv.A.matvec(lv.inv_diag * res))
    n = w.shape[0]
    nc = -(-n // lv.s)
    return jnp.pad(w, (0, nc * lv.s - n)).reshape(nc, lv.s).sum(axis=1)


def _prolong(lv: AMGLevel, xc):
    """x = P xc.

    Interval mode: P = (I - omega D^-1 A) T, and T xc is a fixed-stride
    upsample — repeat + truncate, zero gathers.

    Embedded-greedy mode: P xc = Qp (scatter xc at emb) — a sorted 1-D
    scatter of the coarse vector + one square banded SpMV.
    """
    if lv.emb is not None:
        xe = jnp.zeros(lv.Qp.data.shape[0], xc.dtype).at[lv.emb].set(xc)
        return lv.Qp.matvec(xe)
    if lv.s == 0:
        return ell_matvec(lv.p_data, lv.p_cols, xc)
    n = lv.tv.shape[0]
    u = jnp.repeat(xc, lv.s, total_repeat_length=lv.s * xc.shape[0])[:n]
    if lv.Pop is not None:
        return lv.Pop.matvec(u)         # diag-folded: one banded SpMV
    t = lv.tv * u
    return t - lv.omega * (lv.inv_diag * lv.A.matvec(t))


def _restrict_multi(lv: AMGLevel, res):
    """Multi-RHS restriction: _restrict on [n, q] blocks (same three
    modes; window sums act over the row axis, gathers index rows)."""
    if lv.emb is not None:
        return lv.Qr.matvec_multi(res)[lv.emb]
    if lv.s == 0:
        return ell_matvec_multi(lv.r_data, lv.r_cols, res)
    if lv.Rop is not None:
        w = lv.Rop.matvec_multi(res)
    else:
        w = lv.tv[:, None] * (
            res - lv.omega * lv.A.matvec_multi(lv.inv_diag[:, None] * res))
    n, q = w.shape
    nc = -(-n // lv.s)
    return jnp.pad(w, ((0, nc * lv.s - n), (0, 0))
                   ).reshape(nc, lv.s, q).sum(axis=1)


def _prolong_multi(lv: AMGLevel, xc):
    """Multi-RHS prolongation: _prolong on [n_c, q] blocks."""
    if lv.emb is not None:
        xe = (jnp.zeros((lv.Qp.data.shape[0], xc.shape[1]), xc.dtype)
              .at[lv.emb].set(xc))
        return lv.Qp.matvec_multi(xe)
    if lv.s == 0:
        return ell_matvec_multi(lv.p_data, lv.p_cols, xc)
    n = lv.tv.shape[0]
    u = jnp.repeat(xc, lv.s, axis=0,
                   total_repeat_length=lv.s * xc.shape[0])[:n]
    if lv.Pop is not None:
        return lv.Pop.matvec_multi(u)
    t = lv.tv[:, None] * u
    return t - lv.omega * (lv.inv_diag[:, None] * lv.A.matvec_multi(t))


def _vcycle_multi(h: AMGHierarchy, l: int, R):
    """Multi-RHS V/W-cycle on [n, q] blocks: one matrix stream per level
    visit for all q right-hand sides.  This is what makes AMG usable as
    the INNER preconditioner of batched block solves (eigen's lockstep
    CG chains): the cycle cost grows ~(1 + q * vector/matrix-traffic
    ratio), not q-fold."""
    if l == len(h.levels):
        return h.coarse_inv @ R
    lv = h.levels[l]
    deg, ratio = h.smoother_degree, h.smoother_ratio
    X = _smooth_multi(lv, deg, ratio, R)
    res = R - lv.A.matvec_multi(X)
    rc = _restrict_multi(lv, res)
    xc = _vcycle_multi(h, l + 1, rc)
    if h.gamma >= 2 and l + 1 < len(h.levels):
        cA = h.levels[l + 1].A
        xc = xc + _vcycle_multi(h, l + 1, rc - cA.matvec_multi(xc))
    X = X + _prolong_multi(lv, xc)
    X = X + _smooth_multi(lv, deg, ratio, R - lv.A.matvec_multi(X))
    return X


def _vcycle(h: AMGHierarchy, l: int, r):
    if l == len(h.levels):
        return h.coarse_inv @ r
    lv = h.levels[l]
    deg, ratio = h.smoother_degree, h.smoother_ratio
    x = _smooth(lv, deg, ratio, r)                       # pre-smooth (x0=0)
    res = r - lv.A.matvec(x)
    rc = _restrict(lv, res)
    xc = _vcycle(h, l + 1, rc)
    # W-cycle (gamma=2): re-visit the coarse problem with its updated
    # residual.  Restores mesh-independent convergence under the 1D
    # interval (semicoarsening) aggregation; cost decays geometrically
    # ((gamma/s)^l) so the fine level still dominates.  Skip when the
    # next level is the dense exact solve (a second visit is a no-op).
    if h.gamma >= 2 and l + 1 < len(h.levels):
        cA = h.levels[l + 1].A
        xc = xc + _vcycle(h, l + 1, rc - cA.matvec(xc))
    x = x + _prolong(lv, xc)                             # correct
    x = x + _smooth(lv, deg, ratio, r - lv.A.matvec(x))  # post-smooth
    return x


def build_amg(A: ELLMatrix, *, coarse_n: int = 1200, max_levels: int = 12,
              omega_scale: float = 4.0 / 3.0, smoother_degree: int = 2,
              smoother_ratio: float = 8.0, aggregation: str = "greedy",
              interval_size: int = 6, cycle: str = "V",
              strength: float = 0.0, transfer: str = "banded",
              chunk: int = 1 << 21,
              walls_out: Optional[dict] = None) -> AMGHierarchy:
    """Build a smoothed-aggregation hierarchy from a concrete ELL matrix.

    ``A`` should be RCM-ordered (banded) — the same precondition as the
    banded SpMV auto-dispatch; min-index-numbered aggregates then keep
    every coarse operator banded.  A non-banded input still works, it just
    rides the gather SpMV.  All setup math runs in float64 on the host;
    device arrays are cast to ``A.dtype``.

    ``aggregation``: "greedy" (Vanek two-pass) or "interval" (fixed-stride
    contiguous aggregates of ``interval_size`` along the RCM line;
    transfers become repeat/reshape + one banded SpMV — every op in the
    V-cycle then rides the Pallas fast path).

    ``transfer`` (greedy only): "banded" (default) embeds the rectangular
    prolongator as a square banded matrix on each aggregate's first fine
    node — transfers are one square banded SpMV + a sorted length-n_c 1-D
    gather/scatter, generalizing the interval trick to arbitrary
    aggregates; "gather" is the legacy O(n_f*Kp) ELL-gather application.

    ``strength`` > 0 aggregates on the strength-filtered graph: an edge
    (i, j) counts only if |a_ij| >= strength * sqrt(|a_ii a_jj|) — the
    classical SA strength measure (Vanek '96).  Essential for high-order
    (P2+) and anisotropic operators, where weak couplings otherwise glue
    unrelated DOFs into one aggregate; 0 disables (P1 Poisson on a
    quasi-uniform mesh doesn't need it).

    ``cycle``: "V" (one coarse visit) or "W" (two — restores
    mesh-independent iteration counts under interval aggregation's 1D
    semicoarsening, at (2/s)^l geometrically-decaying extra coarse work).

    ``walls_out``: optional dict filled with cumulative per-stage setup
    seconds (aggregate / smooth_p / galerkin / plans / transfers /
    coarse_inv) — the decomposition behind precond_setup walls.
    """
    if aggregation not in ("greedy", "interval"):
        raise ValueError(f"unknown aggregation {aggregation!r}")
    if cycle not in ("V", "W"):
        raise ValueError(f"unknown cycle {cycle!r}")
    if transfer not in ("banded", "gather"):
        raise ValueError(f"unknown transfer {transfer!r}")
    import time

    def _tick(key, t0):
        if walls_out is not None:
            walls_out[key] = (walls_out.get(key, 0.0)
                              + time.perf_counter() - t0)
        return time.perf_counter()

    data = np.asarray(A.data, np.float64)
    cols = np.asarray(A.cols)
    dtype = A.dtype
    levels = []
    nnz0 = float(np.count_nonzero(data))
    nnz_total = nnz0
    fine_A = A

    for level_idx in range(max_levels):
        n = data.shape[0]
        if n <= coarse_n:
            break
        t0 = time.perf_counter()
        diag = _diag_of(data, cols)
        inv_d = np.where(diag != 0, 1.0 / diag, 1.0)
        if aggregation == "interval":
            s = int(interval_size)
            agg = np.arange(n, dtype=np.int64) // s
            nc = int((n - 1) // s) + 1
        else:
            agg_cols = cols
            if strength > 0.0:
                # classical SA strength-of-connection: keep (i, j) only if
                # |a_ij| >= theta sqrt(|a_ii a_jj|); weak edges point back
                # at their own row (= removed from the aggregation graph)
                ad = np.abs(diag)
                thr = strength * np.sqrt(
                    ad[:, None] * ad[cols.astype(np.int64)])
                keep = np.abs(data) >= thr
                agg_cols = np.where(
                    keep, cols,
                    np.arange(n, dtype=cols.dtype)[:, None]).astype(np.int32)
            agg, nc = greedy_aggregate(agg_cols)
            if 2 * nc > n and strength > 0.0:
                # coarsening DEGRADED (ratio < 2): deep Galerkin levels
                # densify (K grows ~3x per level under smoothed P), the
                # strength filter then leaves a near-empty graph and
                # aggregation limps by ~1.9x per level into a huge dense
                # coarsest — measured: 2960 -> 1582 blocks at K=128 on
                # the elasticity path, 319 s coarse factorization at
                # 982k DOFs (BENCH_NOTES r5 phase E1).  Retry on the
                # FULL graph — on a dense level unfiltered Vanek gives
                # ratio ~K, and weak-edge merging only costs smoothing
                # quality on a level that carries ~no work.  Healthy
                # filtered levels (ratio 3-9, incl. anisotropic string
                # aggregates at ~3) never trigger this.
                agg2, nc2 = greedy_aggregate(cols)
                if nc2 < nc:
                    agg, nc = agg2, nc2
            # decoupled rows (symmetric Dirichlet elimination) are
            # permanent singletons — group them so they coarsen too
            # (span-capped at ~2x the level bandwidth so the embedded
            # transfers stay banded)
            iso = ~(((cols != np.arange(n, dtype=cols.dtype)[:, None])
                     & (data != 0)).any(axis=1))
            bw = int(np.abs(cols.astype(np.int64)
                            - np.arange(n, dtype=np.int64)[:, None]).max())
            agg, nc = merge_isolated_singletons(
                agg, nc, iso, span=max(2 * bw, 2048))
            if nc >= 0.7 * n:
                # still stalled: stop here and let the dense coarsest
                # solve take the remainder — more levels would add setup +
                # cycle cost without reducing anything.  Guard the dense
                # fallback's size: an early stall on a large level would
                # otherwise allocate an n^2 dense matrix (8 TB at 1M rows)
                # instead of failing clearly.
                if n > max(4 * coarse_n, 20_000):
                    raise ValueError(
                        f"AMG coarsening stalled at {n} rows (aggregation "
                        f"produced {nc} aggregates) — too large for the "
                        "dense coarsest solve; lower `strength` or use "
                        "aggregation='interval'")
                break
        t0 = _tick("aggregate", t0)
        count = np.bincount(agg, minlength=nc).astype(np.float64)
        tval = 1.0 / np.sqrt(count)[agg]          # normalized tentative T

        lmax = float(np.max(np.abs(data).sum(1) * inv_d))   # Gershgorin
        omega = omega_scale / lmax

        # P = (I - omega D^-1 A) T  as deduped COO over [n, nc]
        ar, ac, av = _ell_to_coo(data, cols)
        pr = np.concatenate([ar, np.arange(n, dtype=np.int64)])
        pc = np.concatenate([agg[ac], agg])
        pv = np.concatenate([-omega * inv_d[ar] * av * tval[ac], tval])
        pr, pc, pv = _coo_dedup(pr, pc, pv, nc)
        p_data, p_cols = _coo_to_ell(pr, pc, pv, n, pad_cols=agg)
        t0 = _tick("smooth_p", t0)

        # Galerkin A_c = P^T (A P): native single-pass product when the
        # host library is available (the chunked numpy product below is
        # the executable specification — 80 s vs seconds at 1M rows)
        c_data = None
        try:
            from tpufem import native
            if native.available():
                c_data, c_cols = native.galerkin_ell(
                    data, cols, p_data, p_cols, nc)
        except Exception:
            c_data = None
        if c_data is None:
            cr, cc, cv = _spmm_ell_coo(data, cols, p_data, p_cols, nc,
                                       chunk)
            gr, gc, gv = _spmm_t_coo(p_data, p_cols, cr, cc, cv, nc, chunk)
            c_data, c_cols = _coo_to_ell(gr, gc, gv, nc)
        nnz_total += float(np.count_nonzero(c_data))
        t0 = _tick("galerkin", t0)

        Adev = fine_A if fine_A is not None else ELLMatrix(
            jnp.asarray(data.astype(dtype)),
            jnp.asarray(cols.astype(np.int32)))
        # resolve every level operator's banded plan at setup time (the
        # finest included — idempotent if the caller already primed it):
        # lazy resolution is impossible once the hierarchy crosses a jit
        # boundary as an argument (see _prime_wide)
        _prime_wide(Adev, cols, segment=(level_idx == 0))
        fine_A = None
        t0 = _tick("plans", t0)
        if aggregation == "interval":
            # transfers applied matrix-free (repeat/reshape + banded SpMV).
            # Diag-folding (BENCH_NOTES r4): pre-multiply the tv / omega /
            # inv_d scalings into operator copies in float64 so each
            # transfer is ONE banded SpMV instead of a SpMV + ~7 vector
            # passes:  Rop = diag(tv)(I - omega A D^-1),
            #          Pop = (I - omega D^-1 A) diag(tv)  (= Rop^T).
            c64 = cols.astype(np.int64)
            dslot = np.argmax(cols == np.arange(n)[:, None], axis=1)
            Rop = Pop = None
            if (cols[np.arange(n), dslot] == np.arange(n)).all():
                rop = -omega * tval[:, None] * data * inv_d[c64]
                pop = -omega * inv_d[:, None] * data * tval[c64]
                rop[np.arange(n), dslot] += tval
                pop[np.arange(n), dslot] += tval
                cols_dev = jnp.asarray(cols.astype(np.int32))
                Rop = ELLMatrix(jnp.asarray(rop.astype(dtype)), cols_dev)
                Pop = ELLMatrix(jnp.asarray(pop.astype(dtype)), cols_dev)
                if jax.default_backend() == "tpu":
                    _prime_wide(Rop, cols, segment=(level_idx == 0))
                    _prime_wide(Pop, cols, segment=(level_idx == 0))
                else:
                    Rop._band = Pop._band = None    # gather on CPU
            levels.append(AMGLevel(
                A=Adev,
                inv_diag=jnp.asarray(inv_d.astype(dtype)),
                lmax=lmax,
                p_data=None, p_cols=None, r_data=None, r_cols=None,
                s=s,
                tv=jnp.asarray(tval.astype(dtype)),
                omega=float(omega),
                Rop=Rop, Pop=Pop))
        elif transfer == "banded":
            # embed P [n, nc] as a SQUARE banded matrix on each aggregate's
            # first fine member: emb[c] strictly increases with c (min-index
            # numbering), so Qp (= P with col c moved to emb[c]) has
            # bandwidth ~ fine bandwidth + aggregate span; Qr = Qp^T.
            emb = np.full(nc, n, np.int64)
            np.minimum.at(emb, agg, np.arange(n, dtype=np.int64))
            qp_data, qp_cols = _coo_to_ell(pr, emb[pc], pv, n)
            rr, rc_, rv = _coo_dedup(emb[pc], pr, pv, n)
            qr_data, qr_cols = _coo_to_ell(rr, rc_, rv, n)
            Qp = ELLMatrix(jnp.asarray(qp_data.astype(dtype)),
                           jnp.asarray(qp_cols))
            Qr = ELLMatrix(jnp.asarray(qr_data.astype(dtype)),
                           jnp.asarray(qr_cols))
            if jax.default_backend() == "tpu":
                _prime_wide(Qp, qp_cols, segment=(level_idx == 0))
                _prime_wide(Qr, qr_cols, segment=(level_idx == 0))
            else:
                # interpreted Pallas on CPU costs ~30x the gather: pin the
                # transfer matvecs to the gather there (identical numerics;
                # the banded kernel itself is covered by the sparse tests)
                Qp._band = Qr._band = None
            levels.append(AMGLevel(
                A=Adev,
                inv_diag=jnp.asarray(inv_d.astype(dtype)),
                lmax=lmax,
                p_data=None, p_cols=None, r_data=None, r_cols=None,
                Qp=Qp, Qr=Qr, emb=jnp.asarray(emb.astype(np.int32))))
        else:
            # restriction = P^T, explicitly as its own ELL gather; pad
            # slots point at each aggregate's first member (valid, in-band)
            rr, rc_, rv = _coo_dedup(pc, pr, pv, n)
            r_pad = np.full(nc, n, np.int64)
            np.minimum.at(r_pad, agg, np.arange(n, dtype=np.int64))
            r_data, r_cols = _coo_to_ell(rr, rc_, rv, nc, pad_cols=r_pad)
            levels.append(AMGLevel(
                A=Adev,
                inv_diag=jnp.asarray(inv_d.astype(dtype)),
                lmax=lmax,
                p_data=jnp.asarray(p_data.astype(dtype)),
                p_cols=jnp.asarray(p_cols),
                r_data=jnp.asarray(r_data.astype(dtype)),
                r_cols=jnp.asarray(r_cols)))
        t0 = _tick("transfers", t0)
        data, cols = c_data, c_cols

    # coarsest: explicit dense inverse (SPD, tiny -> one MXU matmul/apply)
    t0 = time.perf_counter()
    n = data.shape[0]
    dense = np.zeros((n, n))
    np.add.at(dense, (np.repeat(np.arange(n), data.shape[1]),
                      cols.astype(np.int64).ravel()), data.ravel())
    coarse_inv = jnp.asarray(sym_dense_inv(dense).astype(dtype))
    _tick("coarse_inv", t0)
    if walls_out is not None:
        walls_out["coarse_rows"] = int(n)

    return AMGHierarchy(levels=tuple(levels), coarse_inv=coarse_inv,
                        smoother_degree=int(smoother_degree),
                        smoother_ratio=float(smoother_ratio),
                        operator_complexity=nnz_total / nnz0,
                        gamma={"V": 1, "W": 2}[cycle])
