"""Device tracing hooks (the reference's timer/profiling analog).

Thin wrappers over ``jax.profiler``: capture a TensorBoard-compatible
device trace around any region, and annotate named phases so SCF cycles /
build steps show up in the trace viewer.
"""
from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace for the enclosed region (view in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope that appears in profiler traces."""
    return jax.profiler.TraceAnnotation(name)
