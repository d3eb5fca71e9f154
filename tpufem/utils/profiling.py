"""jax.profiler integration — trace capture for solver/assembly runs.

SURVEY.md §5 calls for jax.profiler traces as the replacement for the
reference's cudaEvent/printf observability.  Usage:

    from tpufem.utils.profiling import trace
    with trace("/tmp/tpufem-trace"):
        sol = solve_poisson_fast(...)
    # inspect with TensorBoard or xprof

``annotate(name)`` adds named regions that show up in the trace timeline.
"""
from __future__ import annotations

import contextlib

import jax

__all__ = ["trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the profiler timeline (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
