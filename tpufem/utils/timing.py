"""Device timing + throughput metrics.

Ports the reference's instrumentation capability (cudaEvent kernel timers and
clock() phase timers, /root/reference/fea_test.cu:304-315,
fea_test_sm_sym_sparse.cu:295-345; bandwidth reporting atomicadd.cu:169-170)
to the TPU runtime, with one crucial adaptation: under the remote TPU relay a
single dispatch carries ~30 ms of round-trip latency and buffer futures
resolve lazily, so naive wall-timing of one call measures the network, not
the chip.  ``device_seconds_per_rep`` therefore times a *rep-difference*:
run the kernel-loop at low and high repetition counts (loop inside jit,
loop-carried dependence so nothing can be hoisted or elided), force
completion with a host transfer, and divide the difference.  Calibration on
a v5e reproduces 193/197 TFLOP/s bf16 matmul peak and 769/819 GB/s HBM.
"""
from __future__ import annotations

import time
from typing import Callable

import jax.numpy as jnp

__all__ = ["device_seconds_per_rep", "PhaseTimer", "bandwidth_gbs",
           "V5E_HBM_GBS", "V5E_BF16_TFLOPS"]

V5E_HBM_GBS = 819.0      # v5e HBM peak bandwidth
V5E_BF16_TFLOPS = 197.0  # v5e bf16 MXU peak


def _force(x):
    """Force completion: transfer one scalar to host."""
    leaf = x
    while isinstance(leaf, (tuple, list)):
        leaf = leaf[0]
    arr = jnp.asarray(leaf).reshape(-1)
    return float(arr[0])


def device_seconds_per_rep(run: Callable[[int], object], *,
                           reps_low: int = 3, reps_high: int = 53,
                           warmup: bool = True, trials: int = 5) -> float:
    """Seconds per repetition of the kernel inside ``run``.

    ``run(reps)`` must execute its kernel ``reps`` times *inside one jitted
    call* with a loop-carried data dependence (so XLA cannot hoist work out
    of the loop), and return an array.

    Noise model (measured): on top of ~30 ms relay round-trip jitter, the
    shared chip's effective throughput drifts in sustained windows (the same
    in-jit loop measured 0.11-0.31 ms/rep across minutes; multi-tenant
    interference).  Each side of the rep-difference is therefore sampled
    ``trials`` times interleaved and its MINIMUM taken — the timeit
    estimator: both minima approximate the uncontended fast window, and
    their difference is the dedicated-chip seconds-per-rep.  (A median of
    paired differences — the previous scheme — tracks whatever slow window
    the burst landed in, and a slow moment hitting only one side of a pair
    distorts the difference by several x.)
    """
    if warmup:
        _force(run(reps_low))
        _force(run(reps_high))
    lows, highs = [], []
    for _ in range(max(1, trials)):
        t0 = time.perf_counter()
        _force(run(reps_low))
        lows.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _force(run(reps_high))
        highs.append(time.perf_counter() - t0)
    return max((min(highs) - min(lows)) / (reps_high - reps_low), 1e-9)


def bandwidth_gbs(bytes_moved: float, seconds: float) -> float:
    return bytes_moved / seconds / 1e9


class PhaseTimer:
    """Wall-clock phase timing (host phases: mesh gen, pattern build, ...).

    The analogue of the reference's clock() printouts around cuMemAlloc /
    HtoD / kernel / DtoH (/root/reference/fea_test_sm_sym_sparse.cu:295-345),
    as structured data instead of stdout lines.
    """

    def __init__(self):
        self.phases: dict[str, float] = {}
        self._t0 = None
        self._name = None

    def start(self, name: str):
        self._name = name
        self._t0 = time.perf_counter()
        return self

    def stop(self):
        self.phases[self._name] = time.perf_counter() - self._t0
        return self.phases[self._name]

    def __call__(self, name: str):
        import contextlib

        @contextlib.contextmanager
        def ctx():
            t0 = time.perf_counter()
            yield
            self.phases[name] = time.perf_counter() - t0

        return ctx()

    def report(self) -> dict:
        return dict(self.phases)
