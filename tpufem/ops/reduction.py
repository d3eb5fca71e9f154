"""Reduction microbenchmark ops — parity with the reference's atomicadd.cu.

The reference ships a standalone reduction study (naive global atomicAdd,
shared-memory block sums, fp64 atomicCAS emulation, with a CPU golden check
and bandwidth printout — /root/reference/atomicadd.cu:63-170).  The TPU
equivalents of those three strategies:

  * ``reduce_sum``          — single fused jnp.sum (the whole study collapses
                              to one op on TPU; no atomics exist or are
                              needed);
  * ``segment_reduce``      — jax.ops.segment_sum: the deterministic
                              many-bins reduction that replaces atomicAdd
                              scatter in assembly;
  * ``pallas_block_reduce`` — explicit two-stage block reduction written as a
                              Pallas kernel (the shared-memory block-sum
                              analogue), mainly as a kernel-authoring
                              reference and for benchmarking.

``reduction_check`` reproduces the reference's CPU-vs-device golden
comparison (atomicadd.cu:53-56).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["reduce_sum", "segment_reduce", "pallas_block_reduce",
           "reduction_check"]


from tpufem.utils.pallas_ctx import trace_ctx as _trace_ctx


def reduce_sum(x):
    return jnp.sum(x)


def segment_reduce(values, segment_ids, num_segments: int,
                   indices_are_sorted: bool = False):
    return jax.ops.segment_sum(values, segment_ids,
                               num_segments=num_segments,
                               indices_are_sorted=indices_are_sorted)


def _block_sum_kernel(x_ref, out_ref):
    # block partials accumulate into one SMEM cell across the sequential
    # TPU grid (Mosaic cannot store scalars to VMEM, and per-block SMEM
    # windows violate the block rule) — the TPU analogue of the
    # shared-memory block sum
    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[0, 0] = jnp.zeros((), out_ref.dtype)

    out_ref[0, 0] += jnp.sum(x_ref[...])


def pallas_block_reduce(x, block: int = 128 * 1024, interpret: bool = False):
    """Two-stage sum: per-block partial sums in a Pallas kernel + final sum.

    x is flattened and zero-padded to a block multiple (safe for sums).
    """
    flat = x.reshape(-1)
    n = flat.shape[0]
    nblk = max(1, -(-n // block))
    pad = nblk * block - n
    if pad:
        flat = jnp.pad(flat, (0, pad))
    # blocks carry an 8-sublane middle axis: Mosaic requires the last two
    # block dims (8, 128)-divisible or spanning the full array dim
    x2 = flat.reshape(nblk, 8, block // 8)
    with _trace_ctx(x.dtype):
        partial = pl.pallas_call(
            _block_sum_kernel,
            grid=(nblk,),
            in_specs=[pl.BlockSpec((1, 8, block // 8), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, 1), x.dtype),
            interpret=interpret,
        )(x2)
    return partial[0, 0]


def reduction_check(x, device_result) -> dict:
    """CPU golden comparison (parity: atomicadd.cu:53-56)."""
    cpu = float(np.sum(np.asarray(x, np.float64)))
    dev = float(device_result)
    diff = abs(cpu - dev)
    rel = diff / max(abs(cpu), 1e-300)
    return {"cpu": cpu, "device": dev, "abs_diff": diff, "rel_diff": rel,
            "match": rel < 1e-5}
