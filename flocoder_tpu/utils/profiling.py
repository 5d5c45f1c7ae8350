"""Tracing / profiling / NaN-debugging utilities.

Reference (SURVEY.md §5.1-5.2): the reference's only instrumentation is a
``print_vram`` CUDA-memory tracer (general.py:8-15), manual sync points, and
always-on NaN print-probes through the codec forward (codecs.py:178-209,
385-392). TPU-native equivalents:

- ``print_mem``: per-device HBM stats via ``jax.local_devices()[i].memory_stats()``.
- ``trace``: context manager around ``jax.profiler`` emitting a TensorBoard
  trace directory (replaces manual wall-clock + forced syncs).
- ``step_timer``: lightweight wall-clock timing with
  ``block_until_ready`` only at the measurement boundary.
- ``enable_nan_debugging``: flips ``jax_debug_nans`` so XLA raises at the op
  that produced a NaN — replacing the reference's per-layer print probes and
  ``DebuggingSequential`` (SURVEY.md says: behind a flag, not always-on).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

__all__ = ["print_mem", "trace", "step_timer", "enable_nan_debugging"]


def print_mem(tag: str = "") -> dict:
    """Print and return per-device memory stats (print_vram equivalent)."""
    stats = {}
    for d in jax.local_devices():
        s = d.memory_stats() or {}
        used = s.get("bytes_in_use", 0) / 1e9
        limit = s.get("bytes_limit", 0) / 1e9
        stats[str(d)] = (used, limit)
        print(f"[mem] {tag} {d}: {used:.2f}/{limit:.2f} GB")
    return stats


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Profile a region: ``with trace('dir'): run_steps()`` then inspect with
    TensorBoard / xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(label: str = "step", result=None):
    """Time a region with a device sync only at the end."""
    t0 = time.perf_counter()
    out = {}
    try:
        yield out
    finally:
        if result is not None:
            jax.block_until_ready(result)
        out["seconds"] = time.perf_counter() - t0
        print(f"[time] {label}: {out['seconds']*1e3:.1f} ms")


def enable_nan_debugging(enable: bool = True) -> None:
    """XLA-level NaN detection (replaces the reference's print probes)."""
    jax.config.update("jax_debug_nans", enable)
