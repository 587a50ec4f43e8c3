"""Profiling / tracing utilities.

The reference's only instrumentation is a steady_clock around each frame
logged to Rerun (/root/reference/src/visual_odometry.cpp:126-153). Here:
per-stage wall-clock timers with summary statistics plus a thin wrapper over
`jax.profiler` for real TPU traces (xplane dumps viewable in TensorBoard /
xprof).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    """Accumulates wall-clock samples per named stage."""

    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[stage].append(time.perf_counter() - t0)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for stage, xs in self.samples.items():
            a = np.asarray(xs)
            out[stage] = {
                "count": int(a.size),
                "total_s": float(a.sum()),
                "mean_ms": float(a.mean() * 1e3),
                "p50_ms": float(np.percentile(a, 50) * 1e3),
                "p95_ms": float(np.percentile(a, 95) * 1e3),
            }
        return out

    def report(self) -> str:
        lines = [f"{'stage':<24}{'count':>7}{'mean ms':>10}{'p50 ms':>10}"
                 f"{'p95 ms':>10}{'total s':>10}"]
        for stage, s in sorted(self.summary().items(),
                               key=lambda kv: -kv[1]["total_s"]):
            lines.append(f"{stage:<24}{s['count']:>7}{s['mean_ms']:>10.2f}"
                         f"{s['p50_ms']:>10.2f}{s['p95_ms']:>10.2f}"
                         f"{s['total_s']:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TPU xplane) into log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
