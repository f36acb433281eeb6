"""Profiling helpers: jax.profiler traces + phase timers.

The reference's only tracing is a tic/toc Timer (lib/timer.py); here we add
first-class XLA tracing: ``trace(dir)`` context manager wraps
jax.profiler traces viewable in TensorBoard/Perfetto, and
``device_memory_report()`` summarizes live HBM usage per buffer kind.
"""
from __future__ import annotations

import contextlib
import os
from collections import defaultdict


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pcrcg_trace"):
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_report() -> dict:
    """Live buffer sizes per device, MB."""
    import jax

    out = {}
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(dev)] = {
                "bytes_in_use_mb": round(stats.get("bytes_in_use", 0) / 2**20, 1),
                "peak_bytes_in_use_mb": round(stats.get("peak_bytes_in_use", 0) / 2**20, 1),
                "bytes_limit_mb": round(stats.get("bytes_limit", 0) / 2**20, 1),
            }
    return out


def live_buffers_by_shape() -> dict:
    """Aggregate live jax arrays by (shape, dtype) — leak hunting."""
    import jax

    agg = defaultdict(lambda: [0, 0.0])
    for buf in jax.live_arrays():
        key = (str(buf.dtype), tuple(buf.shape))
        agg[key][0] += 1
        agg[key][1] += buf.nbytes / 2**20
    return {f"{d} {s}": {"count": c, "mb": round(m, 2)} for (d, s), (c, m) in sorted(
        agg.items(), key=lambda kv: -kv[1][1]
    )}
