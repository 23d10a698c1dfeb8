"""Timing + counter telemetry.

The reference's observability is wall-clock TimeVectors (per-KF BA time
`opt_tt`, FullSystem.cpp:852-857; loop-closure stage timers,
LoopHandler.h:129-137), `statistics_num*` counters (FullSystem.h:215-223),
and printf logging gated by `setting_debugout_runquiet`. This module keeps
the same shape: named timer vectors, named counters, a quiet-gated logger,
plus `jax.profiler` hooks for device-side tracing.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class Telemetry:
    def __init__(self, quiet: bool = True):
        self.timers: Dict[str, List[float]] = defaultdict(list)
        self.counters: Dict[str, int] = defaultdict(int)
        self.quiet = quiet

    @contextlib.contextmanager
    def timed(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.timers[name].append((time.time() - t0) * 1000.0)

    def count(self, name: str, n: int = 1):
        self.counters[name] += n

    def log(self, msg: str):
        if not self.quiet:
            print(msg, flush=True)

    def report(self) -> Dict:
        import numpy as np
        out = {"counters": dict(self.counters), "timers_ms": {}}
        for k, v in self.timers.items():
            a = np.asarray(v)
            out["timers_ms"][k] = dict(
                n=len(v), mean=float(a.mean()) if len(v) else 0.0,
                median=float(np.median(a)) if len(v) else 0.0,
                max=float(a.max()) if len(v) else 0.0,
            )
        return out

    @contextlib.contextmanager
    def device_trace(self, log_dir: str):
        """jax.profiler trace wrapper for device-side analysis."""
        import jax
        jax.profiler.start_trace(log_dir)
        try:
            yield
        finally:
            jax.profiler.stop_trace()


GLOBAL = Telemetry()
