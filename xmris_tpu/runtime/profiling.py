"""Tracing & per-stage timing utilities.

The reference's only observability was ad-hoc wall-clock prints around the fit
pool (``src/xmris/fitting/amares.py:169,198-202``).  Here tracing is a
first-class utility: ``stage_timer`` records device-synchronized wall times
per pipeline stage, ``trace`` wraps ``jax.profiler`` for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class Timings:
    """Accumulated stage timings in seconds."""

    stages: dict[str, float] = field(default_factory=dict)

    def record(self, name: str, seconds: float) -> None:
        self.stages[name] = self.stages.get(name, 0.0) + seconds

    def total(self) -> float:
        return sum(self.stages.values())

    def report(self) -> str:
        width = max((len(k) for k in self.stages), default=0)
        lines = [f"  {k:<{width}} : {v * 1e3:9.3f} ms" for k, v in self.stages.items()]
        lines.append(f"  {'TOTAL':<{width}} : {self.total() * 1e3:9.3f} ms")
        return "\n".join(lines)


@contextlib.contextmanager
def stage_timer(timings: Timings, name: str, *sync_arrays):
    """Time a pipeline stage, blocking on device results for honest numbers."""
    start = time.perf_counter()
    try:
        yield
    finally:
        for arr in sync_arrays:
            try:
                arr.block_until_ready()
            except AttributeError:
                pass
        timings.record(name, time.perf_counter() - start)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/xmris_tpu_trace"):
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
