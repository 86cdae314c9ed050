"""Tracing / profiling helpers (aux subsystem, SURVEY.md §5.1).

The reference has no timers or counters at all; here:

- `timer(...)`: wall-clock context manager accumulating into a dict,
- `xprof_trace(dir)`: JAX profiler trace context (view with xprof/tensorboard),
- `flops_bandwidth(...)`: achieved-rate report helper for kernels.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

__all__ = ["timer", "xprof_trace", "flops_bandwidth"]


@contextmanager
def timer(name: str, store: dict | None = None, sync=None):
    """Time a block; optionally `sync` is an array/pytree to block on."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        if store is not None:
            store[name] = store.get(name, 0.0) + dt


@contextmanager
def xprof_trace(log_dir: str):
    """Capture a JAX profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_bandwidth(seconds: float, flops: float = 0.0, bytes_moved: float = 0.0) -> dict:
    """Achieved rates for a measured kernel execution."""
    out = {"seconds": seconds}
    if flops:
        out["gflops_per_s"] = flops / seconds / 1e9
    if bytes_moved:
        out["gbytes_per_s"] = bytes_moved / seconds / 1e9
    return out
