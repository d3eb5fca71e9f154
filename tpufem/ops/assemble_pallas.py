"""Pallas TPU kernel: fused P1 stiffness assembly on structured meshes.

The XLA structured-assembly path (tpufem.assemble.structured) materializes
all T*npe² element-matrix planes in HBM between the element kernel and the
pad+sum reduction (~1 GB of intermediate traffic at 1M DOFs).  This kernel
fuses the whole pipeline: element coordinates stream from HBM once, geometry
and all 16 local-matrix entries are computed in VMEM, and contributions are
rolled/accumulated directly into the embedded stencil planes:

    traffic = X (coords, once) + (T+1) * K*NN (output read-modify-write)

with no Ke materialization.  One ``pallas_call`` per element type (the slot/
shift tables are trace-time constants per type); the output array threads
through via ``input_output_aliases`` so accumulation stays in place.

The z halo (an output row takes contributions from cell rows z-1 and z)
comes from one overlapping previous X block, the same neighbor-block trick
as the SpMV kernel.  Layout contract: coordinates prepared by
``element_coords_bt_embedded`` — [T, npe, dim, CZ, E1, E2] with cell
(cy, cx) at minor position (cy+1, cx+1) and *benign* padding cells (unit
simplices, so geometry stays finite); validity masks zero their volumes.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpufem.assemble.structured import StructuredPlan
from tpufem.mesh.core import Mesh
from tpufem.sparse.stencil import StencilMatrix

__all__ = ["element_coords_bt_embedded", "assemble_stencil_pallas"]


from tpufem.utils.pallas_ctx import trace_ctx as _trace_ctx


def element_coords_bt_embedded(mesh: Mesh, plan: StructuredPlan,
                               block_lead: int, dtype=np.float32):
    """[T, npe, dim, CZ, E1, E2] coords in the embedded minor layout.

    Padding cells carry a unit simplex so per-cell geometry is finite
    everywhere; the kernel masks their volumes to zero.
    """
    from tpufem.assemble.planar import element_coords_bt

    info = plan.info
    cg = info.cell_grid                       # (nz, ny, nx)
    sg = plan.store_grid
    T = info.num_types
    npe = mesh.nodes_per_element
    dim = mesh.dim
    X = element_coords_bt(mesh, dtype)        # [T, npe, dim, nz, ny, nx]

    nblk = sg[0] // block_lead
    cz = nblk * block_lead
    out = np.zeros((T, npe, dim, cz, sg[1], sg[2]), dtype)
    # benign padding: node n of the unit simplex at coordinate e_n
    for n_ in range(npe):
        for d in range(dim):
            out[:, n_, d] = 1.0 if n_ == d else 0.0
    out[:, :, :, :cg[0], 1:1 + cg[1], 1:1 + cg[2]] = X
    return out


def _det_inv_3x3(J):
    c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
    c01 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
    c02 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
    det = J[0][0] * c00 + J[0][1] * c01 + J[0][2] * c02
    inv_det = 1.0 / det
    c10 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
    c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
    c12 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
    c20 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
    c21 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
    c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
    inv = [[c00 * inv_det, c10 * inv_det, c20 * inv_det],
           [c01 * inv_det, c11 * inv_det, c21 * inv_det],
           [c02 * inv_det, c12 * inv_det, c22 * inv_det]]
    return det, inv


def _type_kernel(xm_ref, x0_ref, acc_ref, out_ref, *, entry_k, entry_shift,
                 block_lead, cell_grid):
    """One z-block of one element type; accumulates onto acc (aliased out).

    xm/x0: [1, npe, dim, B, E1, E2] previous/current coord blocks;
    acc/out: [K, B, E1, E2] (aliased in-place accumulation).
    """
    npe = len(entry_k)
    dim = npe - 1
    zi = pl.program_id(0)

    xm = xm_ref[0]
    x0 = x0_ref[0]
    # cells [zi*B - 2, zi*B + B - 1): prev block's last 2 + cur's first B-1
    slab = jnp.concatenate([xm[:, :, -2:], x0[:, :, :block_lead - 1]],
                           axis=2)                  # [npe, dim, B+1, E1, E2]
    Bp1 = block_lead + 1
    e1, e2 = slab.shape[-2], slab.shape[-1]

    gz = (jax.lax.broadcasted_iota(jnp.int32, (Bp1, e1, e2), 0)
          + zi * block_lead - 2)
    py = jax.lax.broadcasted_iota(jnp.int32, (Bp1, e1, e2), 1)
    px = jax.lax.broadcasted_iota(jnp.int32, (Bp1, e1, e2), 2)
    valid = ((gz >= 0) & (gz < cell_grid[0])
             & (py >= 1) & (py <= cell_grid[1])
             & (px >= 1) & (px <= cell_grid[2]))

    Xt = [[slab[n_, d] for d in range(dim)] for n_ in range(npe)]
    J = [[Xt[m][d] - Xt[npe - 1][d] for m in range(dim)]
         for d in range(dim)]
    det, inv = _det_inv_3x3(J)
    vol = jnp.where(valid, jnp.abs(det) * (1.0 / 6.0), 0.0)
    G = [[inv[n_][d] for d in range(dim)] for n_ in range(dim)]
    G.append([-sum(inv[n_][d] for n_ in range(dim)) for d in range(dim)])

    updates = {}
    for a in range(npe):
        sz, sy, sx = entry_shift[a]       # components in {1, 2}
        for b in range(npe):
            k = entry_k[a][b]
            ke = sum(G[a][d] * G[b][d] for d in range(dim)) * vol
            contrib = jax.lax.slice_in_dim(ke, 2 - sz, 2 - sz + block_lead,
                                           axis=0)
            if sy - 1:
                contrib = pltpu.roll(contrib, jnp.int32(sy - 1), 1)
            if sx - 1:
                contrib = pltpu.roll(contrib, jnp.int32(sx - 1), 2)
            updates[k] = updates.get(k, 0) + contrib
    # k indices are trace constants: plain ref writes, no scatter.  Every k
    # plane must be written (the out VMEM buffer is not pre-filled).
    num_k = acc_ref.shape[0]
    for k in range(num_k):
        if k in updates:
            out_ref[k] = acc_ref[k] + updates[k]
        else:
            out_ref[k] = acc_ref[k]


def assemble_stencil_pallas(plan: StructuredPlan, X_emb, *,
                            block_lead: int = 2,
                            interpret: bool = False) -> StencilMatrix:
    """Fused stiffness assembly: embedded coords -> StencilMatrix (3D)."""
    if not plan.embedded:
        raise ValueError("plan must be built with structured_plan(embed=True)")
    info = plan.info
    if len(info.node_grid) != 3:
        raise NotImplementedError("fused assembly kernel is 3D-only")
    sg = plan.store_grid
    T, npe, dim = X_emb.shape[0], X_emb.shape[1], X_emb.shape[2]
    K = plan.width
    if sg[0] % block_lead:
        raise ValueError("store leading dim not divisible by block_lead")
    nblk = sg[0] // block_lead
    assert X_emb.shape[3] >= nblk * block_lead, "coords missing lead rows"

    import functools

    xblock = (1, npe, dim, block_lead, sg[1], sg[2])
    oblock = (K, block_lead, sg[1], sg[2])
    cell_grid = tuple(int(c) for c in info.cell_grid)

    data = jnp.zeros((K,) + tuple(sg), X_emb.dtype)
    for t in range(T):
        entry_k = [[int(plan.entry_k[t, a, b]) for b in range(npe)]
                   for a in range(npe)]
        entry_shift = [tuple(int(v) for v in plan.entry_shift[t, a, 0])
                       for a in range(npe)]
        kern = functools.partial(_type_kernel, entry_k=entry_k,
                                 entry_shift=entry_shift,
                                 block_lead=block_lead, cell_grid=cell_grid)
        with _trace_ctx(X_emb.dtype):
            data = pl.pallas_call(
                kern,
                grid=(nblk,),
                in_specs=[
                    pl.BlockSpec(xblock,
                                 lambda zi, tt=t: (tt, 0, 0,
                                                   jnp.maximum(zi - 1, 0), 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(xblock,
                                 lambda zi, tt=t: (tt, 0, 0, zi, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(oblock, lambda zi: (0, zi, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(oblock, lambda zi: (0, zi, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((K,) + tuple(sg), X_emb.dtype),
                input_output_aliases={2: 0},
                interpret=interpret,
            )(X_emb, X_emb, data)
    return StencilMatrix(data.reshape(K, int(np.prod(sg))), plan.offsets)
