"""Profiling / tracing utilities — the TimingStatistics + jax.profiler bridge.

The reference wraps each algorithm phase in CPU timers
(``src/Algorithm/IpTimingStatistics.hpp:37-160``).  Under jit the phases fuse
into one device program, so per-phase host timers are meaningless; the
TPU-native equivalents are:

- solver counters (``SolveResult.counters``: evals, factorizations, solves),
- wall-clock via ``timing_statistics=True`` on :func:`ipopt_tpu.solve`,
- device-level traces via this module's :func:`trace` context manager, viewed
  in TensorBoard/Perfetto (kernel-level timing of the factorization, line
  search, and collective phases).
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace around a block of solver work::

        with ipopt_tpu.profiling.trace("/tmp/ipopt_trace"):
            res = solve(nlp)
            jax.block_until_ready(res.x)

    Open the directory with TensorBoard (or xprof) to see per-kernel timing.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)
