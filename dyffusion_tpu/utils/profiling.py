"""Tracing / profiling utilities.

The TPU equivalents of the reference's minimal tracing (SURVEY.md §5.1:
``time/train/step`` metrics, ``timing_scope`` no-op context manager, GPU
memory printer): ``jax.profiler`` traces plus step wall-clock scopes, and a
device-memory report.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def timing_scope(name: str = "", results: Optional[dict] = None, no_op: bool = False) -> Iterator[None]:
    """Wall-clock scope (ref ``_base_experiment.py:301-313``); stores the
    elapsed time under ``results[name]`` when a dict is given."""
    if no_op:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if results is not None:
            results[name] = dt
        else:
            print(f"Elapsed ``{name}``: {dt:.3f}s")


@contextlib.contextmanager
def profiler_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_report() -> str:
    """Per-device memory stats (TPU analogue of the reference's GPU memory
    printer, ``utils.py:577-588``)."""
    lines = []
    for d in jax.local_devices():
        try:
            stats = d.memory_stats()
            used = stats.get("bytes_in_use", 0) / 2**30
            limit = stats.get("bytes_limit", 0) / 2**30
            lines.append(f"{d}: {used:.2f} / {limit:.2f} GiB in use")
        except Exception:
            lines.append(f"{d}: memory stats unavailable")
    return "\n".join(lines)
