"""SAXPY as a Pallas kernel — the runtime-JIT hello world.

Parity with the reference's NVRTC sanity check (/root/reference/saxpy.cpp:
CUDA source string -> nvrtcCompileProgram -> PTX -> cuLaunchKernel): on TPU
the same "author a kernel, compile at runtime, launch" loop is a Pallas
kernel under jax.jit.

    python examples/saxpy_pallas.py
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_BLOCKS, BLOCK = 32, 128 * 128  # grid/block, like saxpy.cpp's 32x128


def saxpy_kernel(a_ref, x_ref, y_ref, out_ref):
    out_ref[...] = a_ref[0] * x_ref[...] + y_ref[...]


@jax.jit
def saxpy(a, x, y):
    n = x.shape[0]
    # blocks carry an 8-sublane middle axis (Mosaic block rule: last two
    # block dims (8, 128)-divisible or spanning the full array dim)
    x2 = x.reshape(NUM_BLOCKS, 8, -1)
    y2 = y.reshape(NUM_BLOCKS, 8, -1)
    blk8 = x2.shape[2]
    bspec = pl.BlockSpec((1, 8, blk8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        saxpy_kernel,
        grid=(NUM_BLOCKS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), bspec, bspec],
        out_specs=bspec,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
    )(a, x2, y2).reshape(n)


def main():
    n = NUM_BLOCKS * BLOCK
    a = jnp.asarray([5.1], jnp.float32)
    x = jnp.arange(n, dtype=jnp.float32)
    y = jnp.arange(n, dtype=jnp.float32) * 2.0
    interp = jax.devices()[0].platform not in ("tpu", "axon")
    if interp:
        # CPU fallback: plain XLA (the kernel still runs under interpret in
        # tests; here we just check numerics)
        out = a[0] * x + y
    else:
        out = saxpy(a, x, y)
    expected = 5.1 * np.arange(n, dtype=np.float32) + 2.0 * np.arange(
        n, dtype=np.float32)
    err = float(jnp.abs(out - expected).max())
    print(f"saxpy n={n}: max |err| = {err}")
    assert err < 1e-4
    print("PASSED")


if __name__ == "__main__":
    main()
