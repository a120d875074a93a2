"""Profiling and introspection utilities.

The reference has only lightweight wall-clock timing (SURVEY §5.1:
loop.py:184-263 phase timers, _base_experiment.py:425-437 timing_scope,
utils.py:593 GPU memory introspection). This module provides those plus
TPU-appropriate additions: a ``jax.profiler`` trace scope (XLA-level traces,
which the reference has no analog of) and device memory statistics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

__all__ = ["Timers", "timing_scope", "trace_scope", "device_memory_stats",
           "print_device_memory"]


class Timers:
    """Named accumulating wall-clock timers (reference loop.py:184-263)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        out = {}
        for k, v in self.totals.items():
            out[f"time/{k}"] = v
            out[f"time/{k}_mean"] = v / max(self.counts[k], 1)
        return out


@contextlib.contextmanager
def timing_scope(name: str, verbose: bool = True, logger=None, step: Optional[int] = None):
    """Context manager printing/logging the elapsed time of a block
    (reference _base_experiment.timing_scope)."""
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        if verbose:
            print(f"[timing] {name}: {dt:.3f}s", flush=True)
        if logger is not None:
            logger.log({f"time/{name}": dt}, step=step)


@contextlib.contextmanager
def trace_scope(log_dir: str = "/tmp/jax-trace"):
    """XLA-level profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """HBM usage in GB for a device (reference print_gpu_memory_usage,
    utils.py:593). Returns {} if the backend doesn't expose stats."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats()
    except Exception:
        return {}
    if not stats:
        return {}
    gb = 1024**3
    return {
        "bytes_in_use_gb": stats.get("bytes_in_use", 0) / gb,
        "peak_bytes_in_use_gb": stats.get("peak_bytes_in_use", 0) / gb,
        "bytes_limit_gb": stats.get("bytes_limit", 0) / gb,
    }


def print_device_memory(prefix: str = ""):
    stats = device_memory_stats()
    if stats:
        print(
            f"{prefix}HBM: {stats['bytes_in_use_gb']:.2f} GB in use "
            f"(peak {stats['peak_bytes_in_use_gb']:.2f} / "
            f"limit {stats['bytes_limit_gb']:.2f})",
            flush=True,
        )
