"""Fused V-cycle transfer kernels (Pallas TPU): residual+restrict and
prolong+add+smooth in single passes on the embedded layout.

Round-2 profiling put the MG V-cycle's transfer chain (residual kernel ->
extract -> W-stencil -> per-axis sampling matmuls -> embed, and the mirror
prolong chain) at ~0.09 ms of the 0.2 ms V-cycle at n=96 while the fine
smoother itself ran at HBM speed-of-light (BENCH_NOTES.md "Known gaps";
VERDICT.md r2 item 4).  These kernels collapse each chain into one pass:

  * ``const_residual_restrict_embedded``:  rc = mask_c(R (r - A e))
      reads code/r/e fine planes once, writes the 1/8-size coarse vector —
      ~3.4 fine-plane passes replacing ~10;
  * ``const_prolong_add_smooth_embedded``:  e' = S_omega(r, e + P ec)
      reads ec (1/8) + code/r/e, writes e' — ~4.1 passes replacing ~10.

R/P structure (solve/multigrid.py): P = W . inject2, R = sample2 . W with
W = I + 0.5*(mesh adjacency stencil).  Mosaic's hardware lowering rejects
stride-2 vector slices on the minor axes ('vector.extract_strided_slice'
strides must be < 2 — found running on the chip, interpret mode accepts
them), so minor-axis sampling/injection run as exact 0/1 selection-matrix
matmuls on the MXU; the leading axis uses static row unrolling.  W and
the operator A are the same slab-shift arithmetic as
ops/stencil_pallas.py.  Only the constant-coefficient (uniform-box
preconditioner) 3D path is fused — the general-data path keeps the
composed implementation.

Semantics mirror the unfused composition exactly (same masking: resid
follows _apply_const_stencil, rc is zeroed at coarse Dirichlet/padding
rows, P ec is zeroed at fine padding/border rows before the add).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufem.utils.pallas_ctx import trace_ctx as _trace_ctx

__all__ = ["const_residual_restrict_embedded",
           "const_prolong_add_smooth_embedded", "transfer_block"]


def transfer_block(fine_sg, coarse_sg) -> int:
    """Coarse-rows-per-block Bc: divides the coarse leading axis while 2*Bc
    divides the fine leading axis."""
    g = int(np.gcd(int(coarse_sg[0]), int(fine_sg[0]) // 2))
    for b in (8, 4, 2, 1):
        if g % b == 0:
            return b
    return 1


def _take_rows(x_g, idx):
    """Gather leading-axis rows (host-computed static indices)."""
    return jnp.take(x_g, jnp.asarray(idx, jnp.int32), axis=0)


# Selection matmuls are exact: each output element is 1.0*value plus
# zeros, and HIGHEST keeps f32 operands un-rounded on the MXU.
_PREC = jax.lax.Precision.HIGHEST


def _sample_matrix(c_s, cn, f, dtype, transposed=False):
    """0/1 selection matrix S with S[1+i, 2i+1] = 1 for i in [0, cn):
    left-multiplying samples odd fine minor-coords into coarse store
    coords (offset by the embedded layout's border column).  Shape
    [c_s, f], or [f, c_s] when ``transposed`` (the injection adjoint)."""
    shape = (f, c_s) if transposed else (c_s, f)
    p = jax.lax.broadcasted_iota(jnp.int32, shape, 1 if transposed else 0)
    q = jax.lax.broadcasted_iota(jnp.int32, shape, 0 if transposed else 1)
    return ((q == 2 * p - 1) & (p >= 1) & (p <= cn)).astype(dtype)


def _shifted(base, off_minor):
    out = base
    g = base.ndim
    for ax, d in enumerate(off_minor, start=g - len(off_minor)):
        if d:
            out = pltpu.roll(out, jnp.int32((-d) % base.shape[ax]), ax)
    return out


def _adjacency_offsets_3d():
    return ((-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0),
            (0, 0, -1), (0, 0, 1),
            (-1, -1, 0), (1, 1, 0), (-1, 0, -1), (1, 0, 1),
            (0, -1, -1), (0, 1, 1), (-1, -1, -1), (1, 1, 1))


def _const_apply(c_slab, x_slab, offsets_grid, weights, rows):
    """A_const on slab rows [1, 1+rows): same math/masking as
    ops.stencil_pallas._apply_const_stencil."""
    xm = jnp.where(c_slab == 1.0, x_slab, 0.0)
    acc = None
    for k, off in enumerate(offsets_grid):
        dz, minor = off[0], off[1:]
        base = jax.lax.slice_in_dim(xm, 1 + dz, 1 + dz + rows, axis=0)
        term = weights[k] * _shifted(base, minor)
        acc = term if acc is None else acc + term
    c_mid = jax.lax.slice_in_dim(c_slab, 1, 1 + rows, axis=0)
    x_mid = jax.lax.slice_in_dim(x_slab, 1, 1 + rows, axis=0)
    return (jnp.where(c_mid == 1.0, acc, 0.0)
            + jnp.where(c_mid == 2.0, x_mid, 0.0)), c_mid


# -- kernel 1: residual + restrict --------------------------------------------

def _kern_rr(cc_ref, c3_ref, cb_ref, r3_ref, rb_ref, e3_ref, eb_ref,
             o_ref, *, offsets_grid, weights, Bc, cn_minor, c_minor_sg):
    """One coarse block [Bc, cy, cx] of rc = mask_c(R (r - A e)).

    Slabs cover fine store rows [2*c0-3, 2*c0+2*Bc); resid is computed on
    [2*c0-2, 2*c0+2*Bc-1); W + z-sampling unrolls over the Bc coarse rows
    (max resid row accessed: fine 2*c0+2*Bc-2); minor sampling is a pair
    of selection matmuls per coarse row."""
    c_slab = jnp.concatenate([c3_ref[0], cb_ref[...]], axis=0)
    r_slab = jnp.concatenate([r3_ref[0], rb_ref[...]], axis=0)
    e_slab = jnp.concatenate([e3_ref[0], eb_ref[...]], axis=0)
    rows = 2 * Bc + 1                       # resid rows [2c0-2, 2c0+2Bc-1)
    ax, _ = _const_apply(c_slab, e_slab, offsets_grid, weights, rows)
    r_mid = jax.lax.slice_in_dim(r_slab, 1, 1 + rows, axis=0)
    resid = r_mid - ax                      # index j <-> fine row 2c0-2+j

    adj = _adjacency_offsets_3d()
    cny, cnx = cn_minor
    cy_s, cx_s = c_minor_sg
    fy, fx = resid.shape[1], resid.shape[2]
    Sy = _sample_matrix(cy_s, cny, fy, resid.dtype)            # [cy_s, fy]
    SxT = _sample_matrix(cx_s, cnx, fx, resid.dtype, True)     # [fx, cx_s]
    wrows = []
    for t in range(Bc):
        # coarse store row c0+t: fine center row 2(c0+t)-1 -> resid idx 2t+1
        s = 2 * t + 1
        acc = resid[s]
        for (dz, dy, dx) in adj:
            acc = acc + 0.5 * _shifted(resid[s + dz], (dy, dx))
        # minor-axis stride-2 sample + embed-pad as Sy @ acc @ SxT
        wrows.append(jnp.dot(Sy, jnp.dot(acc, SxT, precision=_PREC),
                             precision=_PREC))
    rc = jnp.stack(wrows)                   # [Bc, cy_s, cx_s]
    o_ref[...] = jnp.where(cc_ref[...] == 1.0, rc, 0.0)


def const_residual_restrict_embedded(weights, code_f, code_c, r, e,
                                     fine_plan, coarse_plan, *,
                                     interpret: bool = False):
    """rc = mask_c(restrict(r - A_const e)) in one fused pass (3D only)."""
    f_sg = fine_plan.store_grid
    c_sg = coarse_plan.store_grid
    if len(f_sg) != 3:
        raise ValueError("fused transfers are 3D-only")
    Bc = transfer_block(f_sg, c_sg)
    ncb = c_sg[0] // Bc
    nfb = f_sg[0] // (2 * Bc)
    fy, fx = f_sg[1], f_sg[2]
    cn = tuple(n for n in coarse_plan.info.node_grid)
    K = len(fine_plan.offsets)

    code_g = code_f.reshape(f_sg)
    r_g = r.reshape(f_sg)
    e_g = e.reshape(f_sg)
    cc_g = code_c.reshape(c_sg)

    # leading-axis halos per coarse block i: fine rows [2iBc-3, 2iBc)
    # (clipped at i=0; clipped-garbage rows feed only masked outputs)
    i_arr = np.arange(ncb)[:, None]
    prev_idx = np.clip(2 * Bc * i_arr + np.arange(3)[None] - 3,
                       0, f_sg[0] - 1)
    c3 = _take_rows(code_g, prev_idx)             # [ncb, 3, fy, fx]
    r3 = _take_rows(r_g, prev_idx)
    e3 = _take_rows(e_g, prev_idx)

    def m_fine(i):
        return (jnp.minimum(i, nfb - 1), 0, 0)

    def m_halo(i):
        return (i, 0, 0, 0)

    def m_coarse(i):
        return (i, 0, 0)

    fblock = (2 * Bc, fy, fx)
    kern = functools.partial(
        _kern_rr, offsets_grid=fine_plan.offsets_grid,
        weights=tuple(float(v) for v in weights), Bc=Bc,
        cn_minor=(cn[1], cn[2]), c_minor_sg=(c_sg[1], c_sg[2]))
    in_specs = [
        pl.BlockSpec((Bc, c_sg[1], c_sg[2]), m_coarse,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, fy, fx), m_halo, memory_space=pltpu.VMEM),
        pl.BlockSpec(fblock, m_fine, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, fy, fx), m_halo, memory_space=pltpu.VMEM),
        pl.BlockSpec(fblock, m_fine, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, fy, fx), m_halo, memory_space=pltpu.VMEM),
        pl.BlockSpec(fblock, m_fine, memory_space=pltpu.VMEM),
    ]
    with _trace_ctx(r.dtype):
        rc = pl.pallas_call(
            kern,
            grid=(ncb,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((Bc, c_sg[1], c_sg[2]), m_coarse,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(c_sg, r.dtype),
            interpret=interpret,
        )(cc_g, c3, code_g, r3, r_g, e3, e_g)
    return rc.reshape(-1)


# -- kernel 2: prolong + add + smooth -----------------------------------------

def _kern_pas(ecb_ref, ec2_ref, c1m_ref, cb_ref, c1p_ref, r_ref,
              e1m_ref, eb_ref, e1p_ref, o_ref, *dot_ref, offsets_grid,
              weights, inv_w0, omega, Bf, cn_minor, f_minor):
    """One fine block [Bf, fy, fx] of e' = smooth(r, e + P ec).

    up slab covers fine rows [f0-2, f0+Bf+2); W(up) and e' on
    [f0-1, f0+Bf]; the const smooth consumes the e' slab directly.
    With a dot output, also accumulates <r, e'> (the PCG rz product)."""
    Bc2 = ecb_ref.shape[0]                 # Bf // 2
    cny, cnx = cn_minor
    fy, fx = f_minor
    ec = jnp.concatenate([ecb_ref[...], ec2_ref[0]], axis=0)  # [Bc2+2,...]
    cy_s, cx_s = ec.shape[1], ec.shape[2]
    # coarse row c0+u injects into fine row 2(c0+u)-1 = slab idx 2u+1;
    # minor-axis odd-coord injection is the selection-matmul adjoint:
    # plane = Sy^T @ ec[u] @ Sx  (even fine rows stay zero)
    SyT = _sample_matrix(cy_s, cny, fy, ec.dtype, True)        # [fy, cy_s]
    Sx = _sample_matrix(cx_s, cnx, fx, ec.dtype)               # [cx_s, fx]
    zero_plane = jnp.zeros((fy, fx), ec.dtype)
    planes = []
    for j in range(Bf + 4):
        if j % 2:
            u = (j - 1) // 2
            planes.append(jnp.dot(SyT, jnp.dot(ec[u], Sx, precision=_PREC),
                                  precision=_PREC))
        else:
            planes.append(zero_plane)
    up = jnp.stack(planes)                 # [Bf+4, fy, fx]

    adj = _adjacency_offsets_3d()
    wmid = jax.lax.slice_in_dim(up, 1, Bf + 3, axis=0)
    acc = wmid
    for (dz, dy, dx) in adj:
        base = jax.lax.slice_in_dim(up, 1 + dz, 1 + dz + Bf + 2, axis=0)
        acc = acc + 0.5 * _shifted(base, (dy, dx))

    c_slab = jnp.concatenate([c1m_ref[0], cb_ref[...], c1p_ref[0]], axis=0)
    e_slab = jnp.concatenate([e1m_ref[0], eb_ref[...], e1p_ref[0]], axis=0)
    # P ec exists only on real node rows/cols (padding/border stay zero,
    # matching the unfused embed step)
    pec = jnp.where(c_slab == 0.0, 0.0, acc)
    ep = e_slab + pec                      # e' on rows [f0-1, f0+Bf]

    ax, c_mid = _const_apply(c_slab, ep, offsets_grid, weights, Bf)
    ep_mid = jax.lax.slice_in_dim(ep, 1, 1 + Bf, axis=0)
    invd = jnp.where(c_mid == 1.0, inv_w0, 1.0)
    y = ep_mid + omega * invd * (r_ref[...] - ax)
    o_ref[...] = y
    if dot_ref:
        d_ref = dot_ref[0]

        @pl.when(pl.program_id(0) == 0)
        def _init():
            d_ref[0, 0] = jnp.zeros((), d_ref.dtype)

        d_ref[0, 0] += jnp.sum(r_ref[...] * y)


def const_prolong_add_smooth_embedded(weights, code_f, ec, r, e,
                                      fine_plan, coarse_plan, *,
                                      omega: float = 0.8,
                                      with_dot: bool = False,
                                      interpret: bool = False):
    """e_new = const-smooth(r, e + prolong(ec)) in one fused pass (3D).

    ``with_dot=True`` also returns <r, e_new> (see stencil_smooth_dot)."""
    f_sg = fine_plan.store_grid
    c_sg = coarse_plan.store_grid
    if len(f_sg) != 3:
        raise ValueError("fused transfers are 3D-only")
    Bc = transfer_block(f_sg, c_sg)
    Bf = 2 * Bc
    nfb = f_sg[0] // Bf
    fy, fx = f_sg[1], f_sg[2]
    cn = tuple(coarse_plan.info.node_grid)
    k0 = fine_plan.offsets.index(0)
    w = tuple(float(v) for v in weights)

    code_g = code_f.reshape(f_sg)
    r_g = r.reshape(f_sg)
    e_g = e.reshape(f_sg)
    ec_g = ec.reshape(c_sg)

    i_arr = np.arange(nfb)[:, None]
    # coarse rows [i*Bc, i*Bc+Bc) stream as a block; rows iBc+Bc, iBc+Bc+1
    # via a take-halo (clipped at the top; clipped rows inject into w-slab
    # rows that only feed masked/out-of-block outputs)
    ec2_idx = np.clip(Bc * i_arr + Bc + np.arange(2)[None], 0,
                      c_sg[0] - 1)
    ec2 = _take_rows(ec_g, ec2_idx)                  # [nfb, 2, cy, cx]
    prev1 = np.clip(Bf * i_arr - 1, 0, f_sg[0] - 1)
    next1 = np.clip(Bf * (i_arr + 1), 0, f_sg[0] - 1)
    c1m, c1p = _take_rows(code_g, prev1), _take_rows(code_g, next1)
    e1m, e1p = _take_rows(e_g, prev1), _take_rows(e_g, next1)

    def m_fine(i):
        return (i, 0, 0)

    def m_halo(i):
        return (i, 0, 0, 0)

    def m_coarse(i):
        return (jnp.minimum(i, (c_sg[0] // Bc) - 1), 0, 0)

    fblock = (Bf, fy, fx)
    kern = functools.partial(
        _kern_pas, offsets_grid=fine_plan.offsets_grid, weights=w,
        inv_w0=1.0 / w[k0], omega=float(omega), Bf=Bf,
        cn_minor=(cn[1], cn[2]), f_minor=(fy, fx))
    in_specs = [
        pl.BlockSpec((Bc, c_sg[1], c_sg[2]), m_coarse,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, c_sg[1], c_sg[2]), m_halo,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, fy, fx), m_halo, memory_space=pltpu.VMEM),
        pl.BlockSpec(fblock, m_fine, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, fy, fx), m_halo, memory_space=pltpu.VMEM),
        pl.BlockSpec(fblock, m_fine, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, fy, fx), m_halo, memory_space=pltpu.VMEM),
        pl.BlockSpec(fblock, m_fine, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, fy, fx), m_halo, memory_space=pltpu.VMEM),
    ]
    out_specs = pl.BlockSpec(fblock, m_fine, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct(f_sg, r.dtype)
    if with_dot:
        out_specs = (out_specs,
                     pl.BlockSpec((1, 1), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))
        out_shape = (out_shape, jax.ShapeDtypeStruct((1, 1), r.dtype))
    with _trace_ctx(r.dtype):
        y = pl.pallas_call(
            kern,
            grid=(nfb,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(ec_g, ec2, c1m, code_g, c1p, r_g, e1m, e_g, e1p)
    if with_dot:
        return y[0].reshape(-1), y[1][0, 0]
    return y.reshape(-1)
