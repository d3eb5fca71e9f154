"""Pallas TPU kernel: fused grid-stencil SpMV on the embedded layout.

The XLA formulation of the stencil matvec (tpufem.sparse.stencil) re-reads
the solution vector once per offset (K = 7/15 passes over x), capping it well
below HBM speed-of-light.  This kernel reads each x block (plus its two
leading-axis neighbors for the halo) into VMEM once and applies all K
offset-diagonals from that copy:

    traffic = K*NN (coefficients, mandatory) + 3*NN (x) + NN (y)

It plays the role the reference's shared-memory staging plays for its CUDA
kernels (/root/reference/fea_test_sm.cu:206-228), recast as Pallas block
pipelining.

Layout contract (tpufem.assemble.structured, ``structured_plan(embed=True)``):
fields live on the *embedded* storage grid — every axis carries a built-in
zero halo border, minor axes are padded to (8, 128) tile multiples and the
leading axis to a multiple of 8, node (i, j, k) living at (i+1, j+1, k+1).
Consequences exploited here:

  * the x halo along the leading axis is two precomputed single-row streams
    (last row of each previous block / first row of each next block, built
    by one strided slice per call) — streaming whole neighbor blocks via
    overlapping BlockSpecs would triple the vector traffic to use one row
    of each (measured 2x on the const smoother);
  * edge blocks clamp their neighbor row; the rows that would need the
    out-of-range halo are border rows whose coefficients are zero, so the
    wrong halo values are multiplied away;
  * minor-axis stencil shifts are lane/sublane rolls of VMEM values; roll
    wraparound lands only on border columns whose coefficients are zero;
  * no repacking: the same arrays flow through assembly, SpMV and all CG
    vector algebra.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stencil_matvec_embedded", "stencil_residual_embedded",
           "stencil_smooth_embedded", "stencil_matvec_dot_embedded",
           "stencil_smooth_dot_embedded", "pick_block_lead",
           "const_matvec_embedded", "const_residual_embedded",
           "const_smooth_embedded", "const_smooth_dot_embedded"]


from tpufem.utils.pallas_ctx import trace_ctx as _trace_ctx


def _shifted(base, off_minor):
    """Shift a VMEM-loaded value by grid deltas on the minor axes via rolls.

    out[pos] = base[pos + d] per axis — wraparound writes only into border
    slots, which multiply zero coefficients.
    """
    out = base
    g = base.ndim
    for ax, d in enumerate(off_minor, start=g - len(off_minor)):
        if d:
            out = pltpu.roll(out, jnp.int32((-d) % base.shape[ax]), ax)
    return out


def _apply_stencil(data_ref, xm_ref, x0_ref, xp_ref, offsets_grid,
                   block_lead):
    """A x on one block from the three neighbor x blocks."""
    # assemble the haloed slab [B+2, ...] from the three neighbor blocks
    xv = jnp.concatenate(
        [xm_ref[-1:], x0_ref[...], xp_ref[:1]], axis=0)
    # per-offset rolls on the sliced base: measured faster than hoisting
    # shared rolled slabs (which costs VMEM pressure / pipeline buffers)
    acc = None
    for k, off in enumerate(offsets_grid):
        dz, minor = off[0], off[1:]
        base = jax.lax.slice_in_dim(xv, 1 + dz, 1 + dz + block_lead, axis=0)
        term = data_ref[k] * _shifted(base, minor)
        acc = term if acc is None else acc + term
    return acc


def _kernel(data_ref, xm_ref, x0_ref, xp_ref, y_ref, *, offsets_grid,
            block_lead):
    y_ref[...] = _apply_stencil(data_ref, xm_ref, x0_ref, xp_ref,
                                offsets_grid, block_lead)


def _kernel_residual(data_ref, xm_ref, x0_ref, xp_ref, b_ref, y_ref, *,
                     offsets_grid, block_lead):
    """y = b - A x (fused residual: one pass instead of matvec + subtract)."""
    ax = _apply_stencil(data_ref, xm_ref, x0_ref, xp_ref, offsets_grid,
                        block_lead)
    y_ref[...] = b_ref[...] - ax


def _kernel_smooth(data_ref, xm_ref, x0_ref, xp_ref, r_ref, invd_ref, y_ref,
                   *, offsets_grid, block_lead, omega):
    """y = x + omega * invd * (r - A x) — one fused weighted-Jacobi sweep."""
    ax = _apply_stencil(data_ref, xm_ref, x0_ref, xp_ref, offsets_grid,
                        block_lead)
    y_ref[...] = x0_ref[...] + omega * invd_ref[...] * (r_ref[...] - ax)


def _kernel_matvec_dot(data_ref, xm_ref, x0_ref, xp_ref, y_ref, dot_ref, *,
                       offsets_grid, block_lead):
    """y = A x plus the CG dot <x, A x>, accumulated across grid blocks.

    Saves the separate full-field pass jnp.vdot(p, Ap) costs after an opaque
    pallas matvec (XLA cannot fuse into the kernel's output).
    """
    ax = _apply_stencil(data_ref, xm_ref, x0_ref, xp_ref, offsets_grid,
                        block_lead)
    y_ref[...] = ax

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

    part = jnp.sum(x0_ref[...].astype(dot_ref.dtype)
                   * ax.astype(dot_ref.dtype))
    dot_ref[0, 0] += part


def _kernel_smooth_dot(data_ref, xm_ref, x0_ref, xp_ref, r_ref, invd_ref,
                       y_ref, dot_ref, *, offsets_grid, block_lead, omega):
    """Fused Jacobi sweep plus the PCG dot <r, y> (y being the sweep output).

    The final fine-level smooth of a V-cycle produces the preconditioned
    residual z; PCG immediately needs <r, z> — accumulating it here removes
    one full read of (r, z) per iteration.
    """
    ax = _apply_stencil(data_ref, xm_ref, x0_ref, xp_ref, offsets_grid,
                        block_lead)
    y = x0_ref[...] + omega * invd_ref[...] * (r_ref[...] - ax)
    y_ref[...] = y

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

    dot_ref[0, 0] += jnp.sum(r_ref[...].astype(dot_ref.dtype)
                             * y.astype(dot_ref.dtype))


def pick_block_lead(store_grid, width, dtype_bytes=4,
                    vmem_budget=5 << 20) -> int:
    """Largest leading-axis block that divides the grid and fits VMEM
    (streams are double-buffered: data K*B + x block + y + extras, times 2;
    the halo rows are negligible)."""
    lead = store_grid[0]
    rest = int(np.prod(store_grid[1:])) if len(store_grid) > 1 else 1
    best = 1
    b = 1
    while b * 2 <= lead:
        b *= 2
        if lead % b:
            break
        bytes_needed = 2 * (width * b + 4 * b) * rest * dtype_bytes
        if bytes_needed > vmem_budget:
            break
        best = b
    return best


def _halo_rows(ag, nblk, block_lead):
    """Per-block leading-axis halo rows of an [L, *minor] grid array.

    Returns (prev, nxt), each [nblk, *minor]: prev[i] = last row of block
    i-1, nxt[i] = first row of block i+1, edge blocks clamped (the clamped
    rows feed only zero-coefficient border rows).  One strided slice each —
    ~2/B of a plane of traffic, replacing a full extra pass per neighbor.
    """
    ab = ag.reshape((nblk, block_lead) + ag.shape[1:])
    last = ab[:, block_lead - 1]                  # [nblk, *minor]
    first = ab[:, 0]
    prev = jnp.concatenate([last[:1], last[:-1]], axis=0)
    nxt = jnp.concatenate([first[1:], first[-1:]], axis=0)
    return prev, nxt


def _stencil_call(kern_fn, data, x, extras, plan, block_lead, interpret,
                  with_dot=False, **kern_kwargs):
    """Shared driver: stencil kernel over (data, 3x x halo blocks, *extras).

    ``data`` may be a lower precision than ``x`` (e.g. bfloat16 coefficient
    planes with float32 vectors — the mixed-precision V-cycle): products
    promote in-register, vectors and outputs stay at x.dtype, and the
    dominant K-plane coefficient traffic is halved.

    ``with_dot=True`` adds a scalar output accumulated across grid blocks
    (kern_fn decides what it dots); returns (y, dot).
    """
    if not plan.embedded:
        raise ValueError("plan must be built with structured_plan(embed=True)")
    sg = plan.store_grid
    g = len(sg)
    K = data.shape[0]
    offsets_grid = plan.offsets_grid

    if _needs_2d(sg, K, len(extras), np.dtype(x.dtype).itemsize):
        # minor planes too large for the 1D layout's VMEM live set: run the
        # (Bz, By)-blocked variant (ignores block_lead)
        return _stencil_call2(_KERNEL2_OF[kern_fn], data, x, extras, plan,
                              interpret, with_dot=with_dot, **kern_kwargs)

    if block_lead is None:
        block_lead = pick_block_lead(sg, K, np.dtype(x.dtype).itemsize)
    if sg[0] % block_lead:
        raise ValueError(f"leading dim {sg[0]} not divisible by block "
                         f"{block_lead}")
    nblk = sg[0] // block_lead

    data_g = data.reshape((K,) + sg)
    x_g = x.reshape(sg)
    extras_g = [e.reshape(sg) for e in extras]
    x_prev, x_next = _halo_rows(x_g, nblk, block_lead)

    zeros = (0,) * (g - 1)
    xblock = (block_lead,) + sg[1:]
    rowblock = (1,) + sg[1:]

    def xmap_cur(i):
        return (i,) + zeros

    kern = functools.partial(kern_fn, offsets_grid=offsets_grid,
                             block_lead=block_lead, **kern_kwargs)
    in_specs = [
        pl.BlockSpec((K,) + xblock, lambda i: (0, i) + zeros,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(rowblock, xmap_cur, memory_space=pltpu.VMEM),
        pl.BlockSpec(xblock, xmap_cur, memory_space=pltpu.VMEM),
        pl.BlockSpec(rowblock, xmap_cur, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(xblock, xmap_cur, memory_space=pltpu.VMEM)
         for _ in extras_g]
    out_specs = pl.BlockSpec(xblock, xmap_cur, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(sg, x.dtype)
    if with_dot:
        # constant index map: the (1,1) SMEM block persists across the
        # sequential TPU grid, so += accumulates the global reduction
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), x.dtype))
    # x64 must be off while tracing the kernel + index maps: i64 grid
    # indices send Mosaic's convert lowering into infinite recursion
    with _trace_ctx(x.dtype):
        y = pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(data_g, x_prev, x_g, x_next, *extras_g)
    if with_dot:
        return y[0].reshape(-1), y[1][0, 0]
    return y.reshape(-1)


# -- 2D-blocked drivers (huge grids) ------------------------------------------
#
# The 1D driver holds K data planes x a full minor plane per leading row in
# VMEM; past ~300^3 even a one-row block exceeds the 16 MB VMEM limit
# (measured OOM at 328x328x384: 18.26 MB at block_lead=1).  These variants
# block BOTH leading axes with a (Bz, By) grid; the x halo — which now needs
# corner values — comes from nine overlapping clamped BlockSpecs (the fused
# assembly kernel's pattern).  That costs 9x the x traffic, but x is 4 of
# K+5 streams, so the total rises only ~25%; clamped-edge garbage multiplies
# the zero coefficients of embedded-border rows exactly as in the 1D case.

_VMEM_1D_LIMIT = 10 << 20     # dispatch to 2D when 1D at block 1 exceeds


def _needs_2d(sg, width, n_extras, dtype_bytes):
    if len(sg) < 3:
        return False
    rest = int(np.prod(sg[1:]))
    return 2 * (width + 4 + n_extras) * rest * dtype_bytes > _VMEM_1D_LIMIT


def _pick_blocks2(sg, width, n_extras, dtype_bytes, budget=3 << 20):
    """(Bz, By) for the 2D driver: both divide their axes (all embedded
    store axes are multiples of 8); Bz halves until the estimated live set
    fits.  The budget is deliberately ~5x under the 16 MB scoped-VMEM
    limit: Mosaic's actual allocation (slab concats, per-offset rolls,
    accumulators) measured ~2.5x this stream estimate (16.28 MB at an
    estimated 6.55 at 392^2 x 512)."""
    E2 = sg[2]
    Bz = 8 if sg[0] % 8 == 0 else (4 if sg[0] % 4 == 0 else
                                   (2 if sg[0] % 2 == 0 else 1))
    By = 8
    if sg[1] % 8:
        By = sg[1]

    def est(bz, by):
        return 2 * (width + 9 + 1 + n_extras) * bz * by * E2 * dtype_bytes

    while Bz > 1 and est(Bz, By) > budget:
        Bz //= 2
    while (By * 2 <= sg[1] and sg[1] % (By * 2) == 0
           and est(Bz, By * 2) <= budget):
        By *= 2
    return Bz, By


def _slab9(xs, Bz, By):
    """(Bz+2, By+2, E2) haloed slab from nine (Bz, By, E2) neighbor blocks
    (row-major (dz, dy) order)."""
    def yext(a, b, c):
        return jnp.concatenate([a[:, -1:], b[...], c[:, :1]], axis=1)
    top = yext(xs[0], xs[1], xs[2])
    mid = yext(xs[3], xs[4], xs[5])
    bot = yext(xs[6], xs[7], xs[8])
    return jnp.concatenate([top[-1:], mid, bot[:1]], axis=0)


def _apply_stencil9(data_ref, slab, offsets_grid, Bz, By):
    acc = None
    for k, off in enumerate(offsets_grid):
        dz, dy, dx = off[0], off[1], off[2]
        base = jax.lax.slice(
            slab, (1 + dz, 1 + dy, 0),
            (1 + dz + Bz, 1 + dy + By, slab.shape[2]))
        term = data_ref[k] * _shifted(base, (dx,))
        acc = term if acc is None else acc + term
    return acc


def _kernel2(data_ref, *refs, offsets_grid, Bz, By):
    xs, y_ref = refs[:9], refs[9]
    y_ref[...] = _apply_stencil9(data_ref, _slab9(xs, Bz, By),
                                 offsets_grid, Bz, By)


def _kernel2_residual(data_ref, *refs, offsets_grid, Bz, By):
    xs, b_ref, y_ref = refs[:9], refs[9], refs[10]
    ax = _apply_stencil9(data_ref, _slab9(xs, Bz, By), offsets_grid, Bz, By)
    y_ref[...] = b_ref[...] - ax


def _kernel2_smooth(data_ref, *refs, offsets_grid, Bz, By, omega):
    xs, r_ref, invd_ref, y_ref = refs[:9], refs[9], refs[10], refs[11]
    ax = _apply_stencil9(data_ref, _slab9(xs, Bz, By), offsets_grid, Bz, By)
    y_ref[...] = xs[4][...] + omega * invd_ref[...] * (r_ref[...] - ax)


def _kernel2_matvec_dot(data_ref, *refs, offsets_grid, Bz, By):
    xs, y_ref, dot_ref = refs[:9], refs[9], refs[10]
    ax = _apply_stencil9(data_ref, _slab9(xs, Bz, By), offsets_grid, Bz, By)
    y_ref[...] = ax

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

    dot_ref[0, 0] += jnp.sum(xs[4][...].astype(dot_ref.dtype)
                             * ax.astype(dot_ref.dtype))


def _kernel2_smooth_dot(data_ref, *refs, offsets_grid, Bz, By, omega):
    xs, r_ref, invd_ref = refs[:9], refs[9], refs[10]
    y_ref, dot_ref = refs[11], refs[12]
    ax = _apply_stencil9(data_ref, _slab9(xs, Bz, By), offsets_grid, Bz, By)
    y = xs[4][...] + omega * invd_ref[...] * (r_ref[...] - ax)
    y_ref[...] = y

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

    dot_ref[0, 0] += jnp.sum(r_ref[...].astype(dot_ref.dtype)
                             * y.astype(dot_ref.dtype))


_KERNEL2_OF = {_kernel: _kernel2,
               _kernel_residual: _kernel2_residual,
               _kernel_smooth: _kernel2_smooth,
               _kernel_matvec_dot: _kernel2_matvec_dot,
               _kernel_smooth_dot: _kernel2_smooth_dot}



def _cmap2(di, dj, nzb, nyb):
    def m(zi, yj):
        return (jnp.clip(zi + di, 0, nzb - 1),
                jnp.clip(yj + dj, 0, nyb - 1), 0)
    return m


def _cur2(zi, yj):
    return (zi, yj, 0)


def _nine_specs(xblock, nzb, nyb):
    return [pl.BlockSpec(xblock, _cmap2(di, dj, nzb, nyb),
                         memory_space=pltpu.VMEM)
            for di in (-1, 0, 1) for dj in (-1, 0, 1)]


def _run_blocked2(kern2_fn, plan, dtype, in_specs, args, Bz, By, interpret,
                  with_dot, **kern_kwargs):
    """Shared pallas_call plumbing of the (Bz, By)-blocked drivers."""
    sg = plan.store_grid
    nzb, nyb = sg[0] // Bz, sg[1] // By
    xblock = (Bz, By, sg[2])
    kern = functools.partial(kern2_fn, offsets_grid=plan.offsets_grid,
                             Bz=Bz, By=By, **kern_kwargs)
    out_specs = pl.BlockSpec(xblock, _cur2, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(sg, dtype)
    if with_dot:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1), lambda zi, yj: (0, 0),
                                  memory_space=pltpu.SMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), dtype))
    with _trace_ctx(dtype):
        y = pl.pallas_call(
            kern,
            grid=(nzb, nyb),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(*args)
    if with_dot:
        return y[0].reshape(-1), y[1][0, 0]
    return y.reshape(-1)


def _stencil_call2(kern2_fn, data, x, extras, plan, interpret,
                   with_dot=False, **kern_kwargs):
    sg = plan.store_grid
    K = data.shape[0]
    Bz, By = _pick_blocks2(sg, K, len(extras),
                           np.dtype(x.dtype).itemsize)
    nzb, nyb = sg[0] // Bz, sg[1] // By
    data_g = data.reshape((K,) + sg)
    x_g = x.reshape(sg)
    extras_g = [e.reshape(sg) for e in extras]
    xblock = (Bz, By, sg[2])
    in_specs = [pl.BlockSpec((K,) + xblock,
                             lambda zi, yj: (0, zi, yj, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += _nine_specs(xblock, nzb, nyb)
    in_specs += [pl.BlockSpec(xblock, _cur2, memory_space=pltpu.VMEM)
                 for _ in extras_g]
    return _run_blocked2(kern2_fn, plan, x.dtype, in_specs,
                         (data_g, *([x_g] * 9), *extras_g), Bz, By,
                         interpret, with_dot, **kern_kwargs)


def stencil_matvec_embedded(data, x, plan, *, block_lead: int | None = None,
                            interpret: bool = False):
    """y = A x on the embedded storage layout.

    data: [K, num_store_rows] (StencilMatrix.data from an embed=True plan);
    x:    [num_store_rows]; returns y [num_store_rows].
    """
    return _stencil_call(_kernel, data, x, [], plan, block_lead, interpret)


def stencil_residual_embedded(data, b, x, plan, *,
                              block_lead: int | None = None,
                              interpret: bool = False):
    """r = b - A x, fused in one pass."""
    return _stencil_call(_kernel_residual, data, x, [b], plan, block_lead,
                         interpret)


def stencil_smooth_embedded(data, r, x, inv_diag, plan, *,
                            omega: float = 0.8,
                            block_lead: int | None = None,
                            interpret: bool = False):
    """x + omega * inv_diag * (r - A x): one fused weighted-Jacobi sweep."""
    return _stencil_call(_kernel_smooth, data, x, [r, inv_diag], plan,
                         block_lead, interpret, omega=omega)


def stencil_matvec_dot_embedded(data, x, plan, *,
                                block_lead: int | None = None,
                                interpret: bool = False):
    """(A x, <x, A x>) in one pass — the PCG alpha-dot fused into the SpMV."""
    return _stencil_call(_kernel_matvec_dot, data, x, [], plan, block_lead,
                         interpret, with_dot=True)


def stencil_smooth_dot_embedded(data, r, x, inv_diag, plan, *,
                                omega: float = 0.8,
                                block_lead: int | None = None,
                                interpret: bool = False):
    """(y, <r, y>) with y the fused Jacobi sweep — the PCG rz-dot fused into
    the V-cycle's final fine-level smooth."""
    return _stencil_call(_kernel_smooth_dot, data, x, [r, inv_diag], plan,
                         block_lead, interpret, with_dot=True, omega=omega)


# -- constant-coefficient (uniform-grid) stencil kernels ----------------------
#
# On a uniform box every interior row of the Dirichlet-eliminated Poisson
# operator carries the SAME K weights (the structured generators split all
# cells identically), so the coefficient planes — 15/17 of the general
# kernel's HBM traffic — are compile-time constants.  One small "code"
# plane distinguishes row types (1 = interior, 2 = Dirichlet/identity,
# 0 = embedded padding) and doubles as the column mask (Dirichlet
# elimination zeroes interior->bc couplings).  Used as the multigrid
# preconditioner operator: the CG matvec keeps the general assembled data
# (true residuals of whatever system the user built), while every V-cycle
# pass streams only vectors.

def _apply_const_stencil(cm_ref, c0_ref, cp_ref, xm_ref, x0_ref, xp_ref,
                         offsets_grid, weights, block_lead):
    xv = jnp.concatenate([xm_ref[-1:], x0_ref[...], xp_ref[:1]], axis=0)
    cv = jnp.concatenate([cm_ref[-1:], c0_ref[...], cp_ref[:1]], axis=0)
    xmask = jnp.where(cv == 1.0, xv, 0.0)
    acc = None
    for k, off in enumerate(offsets_grid):
        dz, minor = off[0], off[1:]
        base = jax.lax.slice_in_dim(xmask, 1 + dz, 1 + dz + block_lead,
                                    axis=0)
        term = weights[k] * _shifted(base, minor)
        acc = term if acc is None else acc + term
    c0 = c0_ref[...]
    return jnp.where(c0 == 1.0, acc, 0.0) + jnp.where(c0 == 2.0,
                                                      x0_ref[...], 0.0)


def _kernel_const_matvec(cm, c0, cp, xm, x0, xp, y_ref, *, offsets_grid,
                         weights, block_lead):
    y_ref[...] = _apply_const_stencil(cm, c0, cp, xm, x0, xp, offsets_grid,
                                      weights, block_lead)


def _kernel_const_residual(cm, c0, cp, xm, x0, xp, b_ref, y_ref, *,
                           offsets_grid, weights, block_lead):
    ax = _apply_const_stencil(cm, c0, cp, xm, x0, xp, offsets_grid, weights,
                              block_lead)
    y_ref[...] = b_ref[...] - ax


def _kernel_const_smooth(cm, c0, cp, xm, x0, xp, r_ref, y_ref, *,
                         offsets_grid, weights, inv_w0, omega, block_lead):
    ax = _apply_const_stencil(cm, c0, cp, xm, x0, xp, offsets_grid, weights,
                              block_lead)
    invd = jnp.where(c0[...] == 1.0, inv_w0, 1.0)
    y_ref[...] = x0[...] + omega * invd * (r_ref[...] - ax)


def _kernel_const_smooth_dot(cm, c0, cp, xm, x0, xp, r_ref, y_ref, dot_ref,
                             *, offsets_grid, weights, inv_w0, omega,
                             block_lead):
    ax = _apply_const_stencil(cm, c0, cp, xm, x0, xp, offsets_grid, weights,
                              block_lead)
    invd = jnp.where(c0[...] == 1.0, inv_w0, 1.0)
    y = x0[...] + omega * invd * (r_ref[...] - ax)
    y_ref[...] = y

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

    dot_ref[0, 0] += jnp.sum(r_ref[...] * y)


def _const_stencil_call(kern_fn, code, x, extras, plan, block_lead,
                        interpret, with_dot=False, **kern_kwargs):
    """Driver for constant-coefficient kernels: (code x3, x x3, *extras)."""
    if not plan.embedded:
        raise ValueError("plan must be built with structured_plan(embed=True)")
    sg = plan.store_grid
    g = len(sg)

    if _needs_2d(sg, 3, len(extras), np.dtype(x.dtype).itemsize):
        return _const_stencil_call2(_KERNEL2_CONST_OF[kern_fn], code, x,
                                    extras, plan, interpret,
                                    with_dot=with_dot, **kern_kwargs)

    if block_lead is None:
        block_lead = pick_block_lead(sg, 4, np.dtype(x.dtype).itemsize)
    if sg[0] % block_lead:
        raise ValueError(f"leading dim {sg[0]} not divisible by block "
                         f"{block_lead}")
    nblk = sg[0] // block_lead

    code_g = code.reshape(sg)
    x_g = x.reshape(sg)
    extras_g = [e.reshape(sg) for e in extras]
    c_prev, c_next = _halo_rows(code_g, nblk, block_lead)
    x_prev, x_next = _halo_rows(x_g, nblk, block_lead)

    zeros = (0,) * (g - 1)
    xblock = (block_lead,) + sg[1:]
    rowblock = (1,) + sg[1:]

    def m_cur(i):
        return (i,) + zeros

    kern = functools.partial(kern_fn, offsets_grid=plan.offsets_grid,
                             block_lead=block_lead, **kern_kwargs)
    halo_spec = [pl.BlockSpec(rowblock, m_cur, memory_space=pltpu.VMEM),
                 pl.BlockSpec(xblock, m_cur, memory_space=pltpu.VMEM),
                 pl.BlockSpec(rowblock, m_cur, memory_space=pltpu.VMEM)]
    in_specs = halo_spec + halo_spec + [
        pl.BlockSpec(xblock, m_cur, memory_space=pltpu.VMEM)
        for _ in extras_g]
    out_specs = pl.BlockSpec(xblock, m_cur, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(sg, x.dtype)
    if with_dot:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), x.dtype))
    with _trace_ctx(x.dtype):
        y = pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(c_prev, code_g, c_next, x_prev, x_g, x_next, *extras_g)
    if with_dot:
        return y[0].reshape(-1), y[1][0, 0]
    return y.reshape(-1)


# 2D-blocked const kernels (huge grids): code and x each arrive as nine
# clamped neighbor blocks; same masking discipline as the 1D const path
# (clamped-edge garbage feeds only rows whose c0 is 0/2, which the output
# select discards).

def _apply_const_stencil9(cs, xs, offsets_grid, weights, Bz, By):
    cslab = _slab9(cs, Bz, By)
    xslab = _slab9(xs, Bz, By)
    xmask = jnp.where(cslab == 1.0, xslab, 0.0)
    acc = None
    for k, off in enumerate(offsets_grid):
        dz, dy, dx = off[0], off[1], off[2]
        base = jax.lax.slice(
            xmask, (1 + dz, 1 + dy, 0),
            (1 + dz + Bz, 1 + dy + By, xmask.shape[2]))
        term = weights[k] * _shifted(base, (dx,))
        acc = term if acc is None else acc + term
    c0 = cs[4][...]
    return jnp.where(c0 == 1.0, acc, 0.0) + jnp.where(c0 == 2.0,
                                                      xs[4][...], 0.0)


def _kernel2_const_matvec(*refs, offsets_grid, weights, Bz, By):
    cs, xs, y_ref = refs[:9], refs[9:18], refs[18]
    y_ref[...] = _apply_const_stencil9(cs, xs, offsets_grid, weights,
                                       Bz, By)


def _kernel2_const_residual(*refs, offsets_grid, weights, Bz, By):
    cs, xs, b_ref, y_ref = refs[:9], refs[9:18], refs[18], refs[19]
    ax = _apply_const_stencil9(cs, xs, offsets_grid, weights, Bz, By)
    y_ref[...] = b_ref[...] - ax


def _kernel2_const_smooth(*refs, offsets_grid, weights, inv_w0, omega,
                          Bz, By):
    cs, xs, r_ref, y_ref = refs[:9], refs[9:18], refs[18], refs[19]
    ax = _apply_const_stencil9(cs, xs, offsets_grid, weights, Bz, By)
    invd = jnp.where(cs[4][...] == 1.0, inv_w0, 1.0)
    y_ref[...] = xs[4][...] + omega * invd * (r_ref[...] - ax)


def _kernel2_const_smooth_dot(*refs, offsets_grid, weights, inv_w0, omega,
                              Bz, By):
    cs, xs, r_ref = refs[:9], refs[9:18], refs[18]
    y_ref, dot_ref = refs[19], refs[20]
    ax = _apply_const_stencil9(cs, xs, offsets_grid, weights, Bz, By)
    invd = jnp.where(cs[4][...] == 1.0, inv_w0, 1.0)
    y = xs[4][...] + omega * invd * (r_ref[...] - ax)
    y_ref[...] = y

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init():
        dot_ref[0, 0] = jnp.zeros((), dot_ref.dtype)

    dot_ref[0, 0] += jnp.sum(r_ref[...] * y)


_KERNEL2_CONST_OF = {_kernel_const_matvec: _kernel2_const_matvec,
                     _kernel_const_residual: _kernel2_const_residual,
                     _kernel_const_smooth: _kernel2_const_smooth,
                     _kernel_const_smooth_dot: _kernel2_const_smooth_dot}


def _const_stencil_call2(kern2_fn, code, x, extras, plan, interpret,
                         with_dot=False, **kern_kwargs):
    sg = plan.store_grid
    Bz, By = _pick_blocks2(sg, 9, len(extras),
                           np.dtype(x.dtype).itemsize)
    nzb, nyb = sg[0] // Bz, sg[1] // By
    code_g = code.reshape(sg)
    x_g = x.reshape(sg)
    extras_g = [e.reshape(sg) for e in extras]
    xblock = (Bz, By, sg[2])
    nine = _nine_specs(xblock, nzb, nyb)
    in_specs = nine + nine + [
        pl.BlockSpec(xblock, _cur2, memory_space=pltpu.VMEM)
        for _ in extras_g]
    return _run_blocked2(kern2_fn, plan, x.dtype, in_specs,
                         (*([code_g] * 9), *([x_g] * 9), *extras_g),
                         Bz, By, interpret, with_dot, **kern_kwargs)


def const_matvec_embedded(weights, code, x, plan, *,
                          block_lead: int | None = None,
                          interpret: bool = False):
    """y = A x for the uniform-grid operator: ``weights`` a static tuple of
    K floats (one per plan offset), ``code`` the row-type plane."""
    return _const_stencil_call(_kernel_const_matvec, code, x, [], plan,
                               block_lead, interpret,
                               weights=tuple(float(w) for w in weights))


def const_residual_embedded(weights, code, b, x, plan, *,
                            block_lead: int | None = None,
                            interpret: bool = False):
    return _const_stencil_call(_kernel_const_residual, code, x, [b], plan,
                               block_lead, interpret,
                               weights=tuple(float(w) for w in weights))


def const_smooth_embedded(weights, code, r, x, plan, *, omega: float = 0.8,
                          block_lead: int | None = None,
                          interpret: bool = False):
    w = tuple(float(v) for v in weights)
    k0 = plan.offsets.index(0)
    return _const_stencil_call(_kernel_const_smooth, code, x, [r], plan,
                               block_lead, interpret, weights=w,
                               inv_w0=1.0 / w[k0], omega=float(omega))


def const_smooth_dot_embedded(weights, code, r, x, plan, *,
                              omega: float = 0.8,
                              block_lead: int | None = None,
                              interpret: bool = False):
    w = tuple(float(v) for v in weights)
    k0 = plan.offsets.index(0)
    return _const_stencil_call(_kernel_const_smooth_dot, code, x, [r], plan,
                               block_lead, interpret, with_dot=True,
                               weights=w, inv_w0=1.0 / w[k0],
                               omega=float(omega))
