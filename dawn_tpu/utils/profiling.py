"""Tracing / profiling utilities.

The reference's observability is ad-hoc time.time() probes ("DDIM time",
"AE time", ..._init_cond_test.py:355-398; "unnormal load" warnings,
train...6D.py:263-269) plus a Timer class (FaceBoxes/utils/timer.py). Here the
same surface is structured: PhaseTimer context managers, a Timer with
tic/toc/average, a load-anomaly monitor, and a jax.profiler trace wrapper for
real TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class Timer:
    """tic/toc with running average (FaceBoxes/utils/timer.py:13)."""

    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0

    def tic(self):
        self.start_time = time.time()

    def toc(self, average: bool = True) -> float:
        self.diff = time.time() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff

    def clear(self):
        self.__init__()


class PhaseTimer:
    """Named phase timers with a summary — the structured version of the
    reference's "DDIM time ..." prints."""

    def __init__(self, verbose: bool = True):
        self.times: Dict[str, float] = {}
        self.verbose = verbose

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            if self.verbose:
                print(f"{name} time: {dt:.3f}s")

    def summary(self) -> str:
        total = sum(self.times.values())
        lines = [f"  {k}: {v:.3f}s ({100 * v / max(total, 1e-9):.0f}%)"
                 for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])]
        return "\n".join([f"phases (total {total:.3f}s):"] + lines)


class LoadAnomalyMonitor:
    """Flags slow data-loading steps (train...6D.py:263-269 'unnormal load')."""

    def __init__(self, threshold_s: float = 1.0):
        self.threshold = threshold_s
        self.anomalies = 0
        self._t0 = time.time()

    def reset(self):
        self._t0 = time.time()

    def check(self, step: int) -> Optional[float]:
        dt = time.time() - self._t0
        if dt > self.threshold:
            self.anomalies += 1
            print(f"unnormal load {dt:.2f}s at step {step}")
            return dt
        return None


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace for TensorBoard/XProf — the TPU-native upgrade of
    the reference's host-side timers."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
