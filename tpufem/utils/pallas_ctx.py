"""Shared Pallas tracing context: disable x64 for <=32-bit kernels.

With jax_enable_x64 on, grid indices and index-map arithmetic become i64
and Mosaic's convert lowering recurses infinitely (RecursionError at
compile); forcing int32 inside index maps instead crashes the remote
compile helper.  The working fix is scoping x64 off around the pallas_call
trace whenever the kernel data is <=32-bit; 64-bit kernels (CPU interpret
-mode verification paths) keep x64 on.
"""
from __future__ import annotations

import contextlib

import numpy as np

import jax

__all__ = ["trace_ctx"]


def trace_ctx(dtype):
    if np.dtype(dtype).itemsize <= 4:
        return jax.enable_x64(False)
    return contextlib.nullcontext()
