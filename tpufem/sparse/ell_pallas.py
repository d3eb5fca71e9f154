"""Pallas TPU ELL SpMV for banded unstructured meshes.

The reference's ELL kernel (/root/reference/fea_test_sm_sym_sparse2.cu:273-282)
does a per-entry linear search + atomicAdd.  The TPU kernel below is the
gather side of that layout done natively: TPU has no general vector gather,
but Mosaic *does* support lane-wise gather (``take_along_axis`` on the lane
axis of a VREG-shaped block).  The kernel builds a general banded gather out
of it:

  * rows are tiled into blocks of R = 8k*128; x arrives as three overlapping
    R-blocks (prev/cur/next BlockSpecs) forming a VMEM window of 3R values —
    valid whenever the matrix bandwidth is <= R (true for our mesh
    generators' row-major numbering; RCM-order general meshes first);
  * at plan time each column index is rewritten as a *window-relative*
    position rel = col - window_start in [0, 3R) — one int32 per entry, the
    same index traffic as raw ELL cols;
  * in-kernel, rel splits into (sublane s = rel // 128, lane l = rel % 128);
    for each slot k the kernel loops over the s values that slot actually
    uses anywhere (a static, plan-time table — for quasi-structured meshes
    each slot needs only 2-3 of the 3R/128 window rows) and combines
    lane-gather + sublane-select:

        acc_k = sum_s  where(s_k == s, take_along_axis(window[s], l_k), 0)

    y += data_k * acc_k.  Everything is VREG-shaped; no scatter, no search.

Measured (v5e, 1M rows, K=8): see BENCH_NOTES.md — the point of this kernel
is to replace the XLA gather matvec (sparse/ell.py), the least TPU-friendly
op in the framework (VERDICT.md item 6).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ELLBandPlan", "ell_band_plan", "ell_matvec_pallas",
           "ell_matvec_pallas_multi", "bcsr_band_plan",
           "bcsr_matvec_pallas"]


from tpufem.utils.pallas_ctx import trace_ctx as _trace_ctx


class ELLBandPlan(NamedTuple):
    """Static plan for the banded Pallas ELL SpMV."""
    rel: np.ndarray          # [K, NP] int32 window-relative positions
    data_t: np.ndarray       # [K, NP] values (transposed, padded)
    n: int                   # original rows
    np_rows: int             # padded rows (multiple of R)
    block_rows: int          # R
    d_lists: tuple           # per-k tuple of window-row deltas used, where
                             # delta = rel//128 - (R//128 + own sublane)
    width: int
    # Per-BLOCK delta table [nb, K, Dmax] int32 (sentinel _D_NONE pads):
    # the global d_lists union the deltas of every block (58-75 rounds at
    # 1M rows / bandwidth 1001), but any single block uses only ~18 — RCM
    # level sizes drift slowly, so a block's rows agree on their window
    # offsets.  The per-block kernel reads this table from SMEM and skips
    # sentinel rounds with pl.when.  None unless built per_block=True.
    # NOTE: measured 6.5x SLOWER than the static kernel on hardware
    # (dynamic sublane rotates + scalar branches, BENCH_NOTES r3) — kept
    # as the recorded negative result; the production fast path is
    # ``segments`` below.
    dtab: object = None
    # Contiguous block-range segmentation [(start, end, d_lists), ...]:
    # one STATIC kernel per segment whose d_lists union only that range's
    # blocks (~25 rounds vs 75 global at 1M rows).  Exploits the same
    # slow drift as dtab with zero dynamic ops.
    segments: object = None


# sentinel "no delta" entry in ELLBandPlan.dtab — far outside the valid
# [-R/128, R/128] delta range at any supported R
_D_NONE = 64


def _vmem_params(K, sub, val_bytes, rel_bytes, planes=1):
    """Mosaic compiler params with a scoped-VMEM limit sized to the
    actual block footprint.  The default 16 MB scoped limit OOMs at
    compile on fat-K matrices (Galerkin coarse level of the 1M-row AMG
    hierarchy: K=51 at R=8192 needed 16.38 M, hw r5 phase 3) — size the
    limit at ~6x the double-buffered data+index planes, clamped to
    [32 MB, 100 MB] (v5e VMEM is 128 MB)."""
    foot = K * planes * sub * 128 * (val_bytes + rel_bytes)
    limit = min(100 << 20, max(32 << 20, 6 * foot))
    return pltpu.CompilerParams(vmem_limit_bytes=int(limit))


def auto_block_rows(bw: int, n: int, k: int = None) -> int:
    """The block-size policy (single source; used by ell_band_plan's
    block_rows=None and ELLMatrix auto-dispatch): as large as possible —
    the kernel is per-grid-step latency-bound (R-sweep, BENCH_NOTES r3:
    0.345 -> 0.113 ms at 1M rows going 1024 -> 8192) — capped at 8192
    (the int16 rel-index limit at 3R) and keeping >= 8 grid steps, while
    always covering the bandwidth.

    ``k`` (slot count, when known) caps K*sub <= 1024: Mosaic's scoped
    VMEM stack scales with the per-block live set K * sub * 128, and a
    fat-K matrix (Galerkin coarse levels — K=51 at the 1M-row AMG level 1)
    at R=8192 blew the 16 MB scoped limit at compile (hw r5 phase 3).
    Bandwidth coverage still wins when it must (the vmem_limit_bytes bump
    in the pallas_calls is the rescue there)."""
    r = max(256, -(-bw // 128) * 128,
            min(8192, -(-n // (8 * 128)) * 128))
    if k and k > 0:
        cap = max(256, (1024 // int(k)) * 128)
        r = min(r, max(cap, -(-bw // 128) * 128, 256))
    return r


def ell_band_plan(data, cols, *, block_rows: int = None,
                  per_block: bool = False, segment: bool = True,
                  max_segments: int = 16) -> ELLBandPlan:
    """Rewrite an ELL matrix (data [N, K], cols [N, K]) for the kernel.

    Requires bandwidth <= block_rows: every cols[i, :] must lie within
    [blockstart(i) - R, blockstart(i) + 2R).  Raises ValueError otherwise
    (renumber the mesh, e.g. RCM, or raise block_rows).

    ``block_rows=None`` auto-picks: as large as possible (capped at 8192,
    where the int16 rel index still holds) while covering the bandwidth
    and keeping >= 8 grid steps — the kernel is step-latency-bound
    (R-sweep, BENCH_NOTES r3: 0.345 -> 0.113 ms at 1M rows going
    1024 -> 8192).
    """
    if block_rows is None:
        c = np.asarray(cols)
        nn = c.shape[0]
        bw = int(np.abs(c.astype(np.int64)
                        - np.arange(nn)[:, None]).max()) if nn else 0
        block_rows = auto_block_rows(bw, nn, c.shape[1])
    R = int(block_rows)
    if R % 128:
        raise ValueError("block_rows must be a multiple of 128")
    data = np.asarray(data)
    cols = np.asarray(cols)
    n, K = data.shape
    nb = max(1, -(-n // R))
    np_rows = nb * R
    pad = np_rows - n
    if pad:
        data = np.pad(data, ((0, pad), (0, 0)))
        # padding rows point at themselves (value 0)
        self_cols = np.arange(n, np_rows, dtype=cols.dtype)[:, None]
        cols = np.concatenate(
            [cols, np.broadcast_to(self_cols, (pad, K)).copy()])

    blk = np.arange(np_rows) // R
    w0 = (blk - 1) * R                        # window start per row
    rel = cols.astype(np.int64) - w0[:, None]
    if rel.min() < 0 or rel.max() >= 3 * R:
        bw = int(np.abs(cols - np.arange(np_rows)[:, None]).max())
        raise ValueError(
            f"matrix bandwidth {bw} exceeds block_rows {R}; renumber the "
            "mesh (RCM) or increase block_rows")
    # window-relative positions fit int16 whenever 3R < 32768 — halves
    # the index-plane HBM traffic (rel is K planes, same as data)
    idx_dtype = np.int16 if 3 * R <= 32767 else np.int32
    rel_t = np.ascontiguousarray(rel.T.astype(idx_dtype))     # [K, NP]
    data_t = np.ascontiguousarray(data.T)                      # [K, NP]

    # Static per-slot DELTA usage.  A row at local position (sublane t,
    # lane l) reads window row s = rel // 128; the kernel aligns a whole
    # shifted window copy win[R/128 + d : ...] against the output block, so
    # the loop runs only over d = s - (R/128 + t) values that occur — for a
    # bandwidth-B matrix that is ~2*ceil(B/128)+1 values, independent of R.
    sub = R // 128
    own_sub = (np.arange(np_rows) % R) // 128                  # [NP]
    d_lists = []
    dmat = np.empty((K, np_rows), np.int64)
    for k in range(K):
        d = rel_t[k].astype(np.int64) // 128 - (sub + own_sub)
        if d.min() < -sub or d.max() > sub:
            bw = int(np.abs(cols.astype(np.int64)
                            - np.arange(np_rows)[:, None]).max())
            raise ValueError(
                f"matrix bandwidth {bw} exceeds block_rows {R}; renumber "
                "the mesh (reverse_cuthill_mckee) or increase block_rows")
        d_lists.append(tuple(int(v) for v in np.unique(d)))
        dmat[k] = d

    db = dmat.reshape(K, nb, R)
    uniq = None
    dtab = None
    if per_block:
        uniq = [[frozenset(np.unique(db[k, j]).tolist()) for k in range(K)]
                for j in range(nb)]
        dmax = max(1, max(len(u) for row in uniq for u in row))
        dtab = np.full((nb, K, dmax), _D_NONE, np.int32)
        for j in range(nb):
            for k in range(K):
                u = sorted(uniq[j][k])
                dtab[j, k, :len(u)] = u

    segments = None
    if segment and nb > 1:
        if uniq is None:
            uniq = [[frozenset(np.unique(db[k, j]).tolist())
                     for k in range(K)] for j in range(nb)]
        segments = _segment_blocks(uniq, nb, K, max_segments)
    return ELLBandPlan(rel=rel_t, data_t=data_t, n=n, np_rows=np_rows,
                       block_rows=R, d_lists=tuple(d_lists), width=K,
                       dtab=dtab, segments=segments)


def _segment_blocks(uniq, nb, K, max_segments):
    """Greedy contiguous segmentation of the block range: each segment's
    per-slot delta union stays under a round cap, and the cap is raised
    until the segment count fits ``max_segments``.  RCM level sizes drift
    slowly along the band, so neighboring blocks share most deltas and a
    handful of segments recovers most of the per-block savings
    (measured: 12 segments x ~25 rounds vs 75 globally at 1M rows)."""
    lo = max(sum(len(s) for s in row) for row in uniq)     # densest block
    for cap in range(lo, 16 * K + 1, 2):
        segs = []
        j = 0
        while j < nb:
            cur = [set() for _ in range(K)]
            start = j
            while j < nb:
                trial = [cur[k] | uniq[j][k] for k in range(K)]
                if sum(len(s) for s in trial) > cap and j > start:
                    break
                cur = trial
                j += 1
            segs.append((start, j,
                         tuple(tuple(sorted(s)) for s in cur)))
            if len(segs) > max_segments:
                break
        if len(segs) <= max_segments:
            return tuple(segs)
    return None                                             # give up: global


def _band_block_mv(data, rel_all, win, d_lists):
    """Core banded block matvec: data [K, sub, 128], rel_all [K, sub, 128]
    (window-relative positions), win [3*sub, 128] -> y [sub, 128].

    Delta alignment: shifted window copies win[sub+d : 2*sub+d] line each
    output sublane t up with window row sub+t+d, so one lane-gather + one
    select per delta covers the whole block."""
    K = data.shape[0]
    sub = data.shape[1]
    y = jnp.zeros(data.shape[1:], win.dtype)
    base = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0) + sub
    for k in range(K):
        rel = rel_all[k].astype(jnp.int32)      # rel may be int16 on HBM
        s_idx = rel // 128
        lane = rel - s_idx * 128
        acc = None
        for d in d_lists[k]:
            shifted = jax.lax.slice_in_dim(win, sub + d, 2 * sub + d, axis=0)
            g = jnp.take_along_axis(shifted, lane, axis=1)
            hit = jnp.where(s_idx == base + d, g, 0.0)
            acc = hit if acc is None else acc + hit
        if acc is not None:
            y = y + data[k] * acc
    return y


def _kernel(data_ref, rel_ref, xm_ref, x0_ref, xp_ref, o_ref, *, d_lists):
    """One R-row block: data/rel [K, 1, sub, 128], x prev/cur/next
    [1, sub, 128] each -> y [1, sub, 128]."""
    win = jnp.concatenate([xm_ref[0], x0_ref[0], xp_ref[0]], axis=0)
    o_ref[0] = _band_block_mv(data_ref[:, 0], rel_ref[:, 0], win, d_lists)


def _kernel_multi(data_ref, rel_ref, xm_ref, x0_ref, xp_ref, o_ref, *,
                  d_lists):
    """Multi-RHS variant: x refs [1, 1, sub, 128] (one RHS slice of the
    [q, nb, sub, 128] batch); data/rel as in _kernel.  Runs on a (nb, q)
    grid with the data/rel index maps CONSTANT in q — Pallas skips the
    HBM->VMEM copy when consecutive grid steps map to the same block, so
    the matrix planes stream once per row-block, not once per RHS."""
    win = jnp.concatenate([xm_ref[0, 0], x0_ref[0, 0], xp_ref[0, 0]],
                          axis=0)
    o_ref[0, 0] = _band_block_mv(data_ref[:, 0], rel_ref[:, 0], win,
                                 d_lists)


def _kernel_pb(tab_ref, data_ref, rel_ref, xm_ref, x0_ref, xp_ref, o_ref,
               acc_ref, *, dmax):
    """Per-block delta variant: tab_ref [1, K, dmax] SMEM holds THIS
    block's window-row deltas (sentinel _D_NONE pads); sentinel rounds are
    skipped with pl.when, so each block pays only the gather rounds its own
    rows need (~18 at 1M rows vs the 75-round global union).

    Alignment per round: a dynamic sublane roll of the window by -d lines
    output sublane t up with window row sub+t+d (the static kernel's
    slice_in_dim, with d now a runtime scalar)."""
    win = jnp.concatenate([xm_ref[0], x0_ref[0], xp_ref[0]], axis=0)
    K = data_ref.shape[0]
    sub = x0_ref.shape[1]
    base = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0) + sub
    acc_ref[...] = jnp.zeros_like(acc_ref)
    nwin = win.shape[0]
    for k in range(K):
        rel = rel_ref[k, 0].astype(jnp.int32)   # rel may be int16 on HBM
        s_idx = rel // 128
        lane = rel - s_idx * 128
        for t in range(dmax):
            d = tab_ref[0, k, t]

            @pl.when(d != _D_NONE)
            def _round(k=k, d=d, s_idx=s_idx, lane=lane):
                rolled = pltpu.roll(win, (-d) % nwin, 0)
                mid = jax.lax.slice_in_dim(rolled, sub, 2 * sub, axis=0)
                g = jnp.take_along_axis(mid, lane, axis=1)
                hit = jnp.where(s_idx == base + d, g, 0.0)
                acc_ref[...] += data_ref[k, 0] * hit
    o_ref[0] = acc_ref[...]


def ell_matvec_pallas(plan: ELLBandPlan, data_dev, rel_dev, x, *,
                      interpret: bool = False, per_block: bool = False,
                      segmented=None):
    """y = A x with the banded Pallas kernel.

    data_dev/rel_dev: device copies of plan.data_t / plan.rel ([K, NP]).
    x: [N] (or [NP]); returns y [N].

    ``segmented`` (default: whenever the plan carries segments): one
    static kernel per contiguous block range, each unrolling only that
    range's delta union (~25 rounds vs 58-75 globally at 1M rows).
    ``per_block``: the SMEM delta-table kernel — measured 6.5x slower on
    hardware (BENCH_NOTES r3), kept for the record.
    """
    R = plan.block_rows
    sub = R // 128
    nb = plan.np_rows // R
    K = plan.width
    xp = x
    if x.shape[0] != plan.np_rows:
        xp = jnp.pad(x, (0, plan.np_rows - x.shape[0]))
    x3 = xp.reshape(nb, sub, 128)
    d3 = data_dev.reshape(K, nb, sub, 128)
    r3 = rel_dev.reshape(K, nb, sub, 128)
    if segmented is None:
        segmented = plan.segments is not None and not per_block

    xspec_m = pl.BlockSpec((1, sub, 128),
                           lambda j: (jnp.maximum(j - 1, 0), 0, 0),
                           memory_space=pltpu.VMEM)
    xspec_0 = pl.BlockSpec((1, sub, 128), lambda j: (j, 0, 0),
                           memory_space=pltpu.VMEM)
    xspec_p = pl.BlockSpec((1, sub, 128),
                           lambda j: (jnp.minimum(j + 1, nb - 1), 0, 0),
                           memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((K, 1, sub, 128), lambda j: (0, j, 0, 0),
                         memory_space=pltpu.VMEM)
    cp = _vmem_params(K, sub, data_dev.dtype.itemsize,
                      rel_dev.dtype.itemsize)
    with _trace_ctx(x.dtype):
        if per_block:
            dmax = int(plan.dtab.shape[2])
            kern = functools.partial(_kernel_pb, dmax=dmax)
            y = pl.pallas_call(
                kern,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec((1, K, dmax), lambda j: (j, 0, 0),
                                 memory_space=pltpu.SMEM),
                    dspec, dspec, xspec_m, xspec_0, xspec_p,
                ],
                out_specs=pl.BlockSpec((1, sub, 128), lambda j: (j, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, sub, 128), x.dtype),
                scratch_shapes=[pltpu.VMEM((sub, 128), x.dtype)],
                interpret=interpret,
                compiler_params=cp,
            )(jnp.asarray(plan.dtab), d3, r3, x3, x3, x3)
        elif segmented:
            # one static kernel per contiguous block range; x neighbor
            # blocks come from the FULL x3 via offset index maps so
            # segment-boundary halos need no special casing
            parts = []
            for (s, e, dl) in plan.segments:
                ns_ = e - s
                kern = functools.partial(_kernel, d_lists=dl)

                def off(fn, s=s):
                    return lambda j: fn(j + s)

                specs = [
                    pl.BlockSpec((K, 1, sub, 128),
                                 off(lambda g: (0, g, 0, 0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, 1, sub, 128),
                                 off(lambda g: (0, g, 0, 0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, sub, 128),
                                 off(lambda g: (jnp.maximum(g - 1, 0),
                                                0, 0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, sub, 128), off(lambda g: (g, 0, 0)),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, sub, 128),
                                 off(lambda g: (jnp.minimum(g + 1, nb - 1),
                                                0, 0)),
                                 memory_space=pltpu.VMEM),
                ]
                parts.append(pl.pallas_call(
                    kern,
                    grid=(ns_,),
                    in_specs=specs,
                    out_specs=pl.BlockSpec((1, sub, 128),
                                           lambda j: (j, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((ns_, sub, 128),
                                                   x.dtype),
                    interpret=interpret,
                    compiler_params=cp,
                )(d3, r3, x3, x3, x3))
            y = jnp.concatenate(parts, axis=0)
        else:
            kern = functools.partial(_kernel, d_lists=plan.d_lists)
            y = pl.pallas_call(
                kern,
                grid=(nb,),
                in_specs=[dspec, dspec, xspec_m, xspec_0, xspec_p],
                out_specs=pl.BlockSpec((1, sub, 128), lambda j: (j, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((nb, sub, 128), x.dtype),
                interpret=interpret,
                compiler_params=cp,
            )(d3, r3, x3, x3, x3)
    return y.reshape(-1)[:plan.n]


def ell_matvec_pallas_multi(plan: ELLBandPlan, data_dev, rel_dev, X, *,
                            interpret: bool = False, segmented=None):
    """Y = A X for X [N, q] with the banded kernel — q RHS per matrix read.

    Grid is (nb, q) with q innermost and the data/rel BlockSpec index maps
    constant in q: the Pallas pipeline skips refetching a block whose index
    map returns the same block id on consecutive steps, so the matrix
    planes (the dominant HBM traffic at K ~ 8-14 slots vs one x vector)
    stream ONCE per row-block instead of once per RHS.  This is the
    multi-vector SpMV behind cg_fixed_block / eigen's batched inner solves
    (VERDICT r4 item 7)."""
    if X.ndim != 2:
        raise ValueError("ell_matvec_pallas_multi expects X [N, q]")
    q = X.shape[1]
    R = plan.block_rows
    sub = R // 128
    nb = plan.np_rows // R
    K = plan.width
    Xp = X
    if X.shape[0] != plan.np_rows:
        Xp = jnp.pad(X, ((0, plan.np_rows - X.shape[0]), (0, 0)))
    # [q, nb, sub, 128]
    x4 = jnp.moveaxis(Xp.reshape(nb, sub, 128, q), -1, 0)
    d3 = data_dev.reshape(K, nb, sub, 128)
    r3 = rel_dev.reshape(K, nb, sub, 128)
    if segmented is None:
        segmented = plan.segments is not None
    cp = _vmem_params(K, sub, data_dev.dtype.itemsize,
                      rel_dev.dtype.itemsize)

    def xspec(off):
        def imap(j, qi, off=off):
            jj = jnp.clip(j + off, 0, nb - 1)
            return (qi, jj, 0, 0)
        return pl.BlockSpec((1, 1, sub, 128), imap,
                            memory_space=pltpu.VMEM)

    with _trace_ctx(X.dtype):
        if segmented:
            parts = []
            for (s, e, dl) in plan.segments:
                ns_ = e - s
                kern = functools.partial(_kernel_multi, d_lists=dl)

                def xspec_s(off, s=s):
                    def imap(j, qi, off=off, s=s):
                        jj = jnp.clip(j + s + off, 0, nb - 1)
                        return (qi, jj, 0, 0)
                    return pl.BlockSpec((1, 1, sub, 128), imap,
                                        memory_space=pltpu.VMEM)

                dspec_s = pl.BlockSpec(
                    (K, 1, sub, 128), lambda j, qi, s=s: (0, j + s, 0, 0),
                    memory_space=pltpu.VMEM)
                parts.append(pl.pallas_call(
                    kern,
                    grid=(ns_, q),
                    in_specs=[dspec_s, dspec_s, xspec_s(-1), xspec_s(0),
                              xspec_s(+1)],
                    out_specs=pl.BlockSpec((1, 1, sub, 128),
                                           lambda j, qi: (qi, j, 0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((q, ns_, sub, 128),
                                                   X.dtype),
                    interpret=interpret,
                    compiler_params=cp,
                )(d3, r3, x4, x4, x4))
            y = jnp.concatenate(parts, axis=1)
        else:
            kern = functools.partial(_kernel_multi, d_lists=plan.d_lists)
            dspec_m = pl.BlockSpec((K, 1, sub, 128),
                                   lambda j, qi: (0, j, 0, 0),
                                   memory_space=pltpu.VMEM)
            y = pl.pallas_call(
                kern,
                grid=(nb, q),
                in_specs=[dspec_m, dspec_m, xspec(-1), xspec(0), xspec(+1)],
                out_specs=pl.BlockSpec((1, 1, sub, 128),
                                       lambda j, qi: (qi, j, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((q, nb, sub, 128), X.dtype),
                interpret=interpret,
                compiler_params=cp,
            )(d3, r3, x4, x4, x4)
    # [q, nb, sub, 128] -> [N, q]
    return jnp.moveaxis(y.reshape(q, -1), 0, -1)[:plan.n]


# -- block (BCSR) variant ------------------------------------------------------

def bcsr_band_plan(data, cols, *, block_rows: int = 1024, **plan_kw):
    """Banded plan for a BCSR matrix (data [NR, K, b, b], cols [NR, K]).

    Returns (plan, data_t [K, b, b, NP]) — the plan's rel/d_lists are built
    on the node pattern exactly as in :func:`ell_band_plan`; values are
    transposed to block-leading planes so each (c, d) component streams
    contiguously.
    """
    data = np.asarray(data)
    cols = np.asarray(cols)
    nr, K, b, _ = data.shape
    scalar = np.ones((nr, K), data.dtype)     # only the pattern matters
    plan = ell_band_plan(scalar, cols, block_rows=block_rows, **plan_kw)
    pad = plan.np_rows - nr
    if pad:
        data = np.pad(data, ((0, pad), (0, 0), (0, 0), (0, 0)))
    # [K, b, b, NP]
    data_t = np.ascontiguousarray(np.transpose(data, (1, 2, 3, 0)))
    return plan, data_t


def _block_kernel(data_ref, rel_ref, *refs, d_lists, nb_comp):
    """refs: per-component (xm, x0, xp) triples then o_ref.

    Gathers are shared across the block row: one lane-gather per
    (slot, delta, source component) feeds all nb_comp output components.
    """
    xs = refs[: 3 * nb_comp]
    o_ref = refs[3 * nb_comp]
    wins = [jnp.concatenate([xs[3 * d][0], xs[3 * d + 1][0],
                             xs[3 * d + 2][0]], axis=0)
            for d in range(nb_comp)]
    K = data_ref.shape[0]
    sub = xs[1].shape[1]
    base = jax.lax.broadcasted_iota(jnp.int32, xs[1][0].shape, 0) + sub
    y = [jnp.zeros_like(xs[1][0]) for _ in range(nb_comp)]
    for k in range(K):
        rel = rel_ref[k, 0].astype(jnp.int32)   # rel may be int16 on HBM
        s_idx = rel // 128
        lane = rel - s_idx * 128
        for d in range(nb_comp):
            acc = None
            for dd in d_lists[k]:
                shifted = jax.lax.slice_in_dim(wins[d], sub + dd,
                                               2 * sub + dd, axis=0)
                g = jnp.take_along_axis(shifted, lane, axis=1)
                hit = jnp.where(s_idx == base + dd, g, 0.0)
                acc = hit if acc is None else acc + hit
            if acc is None:
                continue
            for c in range(nb_comp):
                y[c] = y[c] + data_ref[k, c, d, 0] * acc
    o_ref[0] = jnp.stack(y)


def _block_kernel_pb(tab_ref, data_ref, rel_ref, *refs, nb_comp, dmax):
    """Per-block delta-table BCSR kernel: the _block_kernel gather sharing
    (one lane-gather per (slot, delta, source component) feeds all nb_comp
    outputs) with _kernel_pb's SMEM delta table + pl.when round skipping."""
    xs = refs[: 3 * nb_comp]
    o_ref = refs[3 * nb_comp]
    acc_ref = refs[3 * nb_comp + 1]
    wins = [jnp.concatenate([xs[3 * d][0], xs[3 * d + 1][0],
                             xs[3 * d + 2][0]], axis=0)
            for d in range(nb_comp)]
    K = data_ref.shape[0]
    sub = xs[1].shape[1]
    nwin = wins[0].shape[0]
    base = jax.lax.broadcasted_iota(jnp.int32, xs[1][0].shape, 0) + sub
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for k in range(K):
        rel = rel_ref[k, 0].astype(jnp.int32)   # rel may be int16 on HBM
        s_idx = rel // 128
        lane = rel - s_idx * 128
        for t in range(dmax):
            dd = tab_ref[0, k, t]

            @pl.when(dd != _D_NONE)
            def _round(k=k, dd=dd, s_idx=s_idx, lane=lane):
                for d in range(nb_comp):
                    rolled = pltpu.roll(wins[d], (-dd) % nwin, 0)
                    mid = jax.lax.slice_in_dim(rolled, sub, 2 * sub, axis=0)
                    g = jnp.take_along_axis(mid, lane, axis=1)
                    hit = jnp.where(s_idx == base + dd, g, 0.0)
                    for c in range(nb_comp):
                        acc_ref[c] += data_ref[k, c, d, 0] * hit
    o_ref[0] = acc_ref[...]


def bcsr_matvec_pallas(plan: ELLBandPlan, data_dev, rel_dev, x, *,
                       interpret: bool = False, per_block=None):
    """y = A x for a banded BCSR matrix.

    data_dev [K, b, b, NP] (from bcsr_band_plan), rel_dev [K, NP],
    x [b, NR] (component-major).  Returns y [b, NR].  ``per_block``: use
    the per-block delta-table kernel (default: when the plan carries one).
    """
    R = plan.block_rows
    sub = R // 128
    nb = plan.np_rows // R
    K = plan.width
    b = data_dev.shape[1]
    if x.shape[-1] != plan.np_rows:
        x = jnp.pad(x, ((0, 0), (0, plan.np_rows - x.shape[-1])))
    x4 = x.reshape(b, nb, sub, 128)
    d5 = data_dev.reshape(K, b, b, nb, sub, 128)
    r3 = rel_dev.reshape(K, nb, sub, 128)
    cp = _vmem_params(K, sub, data_dev.dtype.itemsize,
                      rel_dev.dtype.itemsize, planes=b * b)
    if per_block is None:
        per_block = False      # 6.5x slower on hardware (BENCH_NOTES r3)

    if per_block:
        dmax = int(plan.dtab.shape[2])
        kern = functools.partial(_block_kernel_pb, nb_comp=b, dmax=dmax)
    else:
        kern = functools.partial(_block_kernel, d_lists=plan.d_lists,
                                 nb_comp=b)
    xm = pl.BlockSpec((1, sub, 128), lambda j: (jnp.maximum(j - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    x0 = pl.BlockSpec((1, sub, 128), lambda j: (j, 0, 0),
                      memory_space=pltpu.VMEM)
    xp = pl.BlockSpec((1, sub, 128), lambda j: (jnp.minimum(j + 1, nb - 1),
                                                0, 0),
                      memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((K, b, b, 1, sub, 128),
                     lambda j: (0, 0, 0, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, 1, sub, 128), lambda j: (0, j, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    xins = []
    for d in range(b):
        for spec in (xm, x0, xp):
            xins.append(spec)
    xargs = [x4[d] for d in range(b) for _ in range(3)]
    if per_block:
        in_specs = [pl.BlockSpec((1, K, dmax), lambda j: (j, 0, 0),
                                 memory_space=pltpu.SMEM)] + in_specs
        args = (jnp.asarray(plan.dtab), d5, r3, *xargs)
        scratch = [pltpu.VMEM((b, sub, 128), x.dtype)]
    else:
        args = (d5, r3, *xargs)
        scratch = []
    with _trace_ctx(x.dtype):
        y = pl.pallas_call(
            kern,
            grid=(nb,),
            in_specs=in_specs + xins,
            out_specs=pl.BlockSpec((1, b, sub, 128),
                                   lambda j: (j, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((nb, b, sub, 128), x.dtype),
            scratch_shapes=scratch,
            interpret=interpret,
            compiler_params=cp,
        )(*args)
    return jnp.moveaxis(y, 1, 0).reshape(b, -1)[:, :plan.n]
