"""Tracing / profiling utilities.

Rebuild of the reference's observability layer (SURVEY.md §5: tqdm +
prints in VO; detectron2 EventStorage + benchmark.py in VPS) with
TPU-native tooling: jax.profiler trace capture, named step timers with
EMA summaries, and an EventStorage-compatible scalar store.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StepTimer:
    """Named wall-clock timers with running means."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            import jax
            jax.block_until_ready(sync)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self):
        return {k: self.totals[k] / max(self.counts[k], 1)
                for k in sorted(self.totals)}

    def report(self):
        return " ".join(f"{k}={1e3 * v:.1f}ms"
                        for k, v in self.summary().items())


@contextlib.contextmanager
def profile_trace(logdir="profiles", enabled=True):
    """jax.profiler trace context (view in TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class EventStorage:
    """Minimal detectron2-EventStorage equivalent: scalar history with
    smoothing, usable by trainers and writers."""

    def __init__(self):
        self._history = defaultdict(list)
        self.iter = 0

    def put_scalar(self, name, value):
        self._history[name].append((self.iter, float(value)))

    def put_scalars(self, **kw):
        for k, v in kw.items():
            self.put_scalar(k, v)

    def latest(self):
        return {k: v[-1][1] for k, v in self._history.items() if v}

    def median(self, name, window=20):
        import numpy as np
        vals = [v for _, v in self._history[name][-window:]]
        return float(np.median(vals)) if vals else 0.0

    def step(self):
        self.iter += 1
