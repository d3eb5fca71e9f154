"""Reduction microbenchmark with golden check + bandwidth report.

Parity with the reference's standalone reduction study
(/root/reference/atomicadd.cu: CPU-vs-GPU result check at :53-56, bandwidth
printout at :169-170) — on TPU the atomic strategies collapse into fused
reductions; this benchmarks them and checks against the CPU golden value.

    python examples/reduction_bench.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from tpufem.ops.reduction import (pallas_block_reduce, reduce_sum,
                                  reduction_check, segment_reduce)
from tpufem.utils.timing import device_seconds_per_rep


def main():
    on_tpu = jax.devices()[0].platform in ("tpu", "axon")
    # 64 MB of float32 on the chip (like the reference's SIZE macro);
    # smaller on CPU where the Pallas interpreter does the block sums
    n = (64 * 1024 * 1024 // 4) if on_tpu else (1 << 20)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(n, np.float32))

    r1 = jax.jit(reduce_sum)(x)
    print("fused sum:        ", reduction_check(x, r1))
    r2 = pallas_block_reduce(x, block=n // 8, interpret=not on_tpu)
    print("pallas block sum: ", reduction_check(x, r2))

    ids = jnp.asarray(rng.integers(0, 1000, n, np.int32))
    r3 = jax.jit(lambda v, i: segment_reduce(v, i, 1000).sum())(x, ids)
    print("segment sum:      ", reduction_check(x, r3))

    @jax.jit
    def sum_many(x, reps):
        def body(i, acc):
            return acc * 0.0 + jnp.sum(x * (1.0 + acc))
        return jax.lax.fori_loop(0, reps, body, 0.0)

    dt = device_seconds_per_rep(lambda r: sum_many(x, r),
                                reps_low=10, reps_high=210)
    print(f"fused sum bandwidth: {n * 4 / dt / 1e9:.0f} GB/s "
          f"({n * 4 / dt / 1e9 / 819:.0%} of v5e HBM peak)")


if __name__ == "__main__":
    main()
