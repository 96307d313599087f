"""Tracing / profiling / debug-nan tooling.

The reference has no profiler (SURVEY §5.1 — tqdm + a wall-clock timer);
this provides the TPU-native equivalents:
- ``trace(log_dir)``: jax.profiler trace context (view in TensorBoard or
  Perfetto);
- ``StepTimer``: per-step wall-clock aggregation with percentile summary;
- ``enable_nan_debugging()``: jax_debug_nans — the dev-mode stand-in for
  torch.autograd.detect_anomaly (ref: captioning_bmrl_loops.py:621,700).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_nan_debugging(on: bool = True) -> None:
    import jax

    jax.config.update("jax_debug_nans", on)


class StepTimer:
    """Accumulates named phase durations; ``summary()`` gives mean/p50/p95."""

    def __init__(self):
        self.samples: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self.samples.items():
            xs_sorted = sorted(xs)
            n = len(xs_sorted)
            out[name] = {
                "n": n,
                "mean_ms": 1e3 * sum(xs) / n,
                "p50_ms": 1e3 * xs_sorted[n // 2],
                "p95_ms": 1e3 * xs_sorted[min(n - 1, int(0.95 * n))],
                "total_s": sum(xs),
            }
        return out

    def reset(self) -> None:
        self.samples.clear()
