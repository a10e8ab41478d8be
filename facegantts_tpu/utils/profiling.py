"""Tracing / profiling hooks (SURVEY.md §5: the reference has none — only
Lightning's ModelSummary and LearningRateMonitor, train.py:62-63.  The TPU
framework gets first-class profiler support).

- :class:`StepProfiler` : arms a ``jax.profiler`` trace over a configured
  window of training steps (``cfg.profile_dir`` / ``profile_start_step`` /
  ``profile_num_steps``); the dump is viewable in TensorBoard's profile tab
  or xprof.
- :func:`annotate` : named ``TraceAnnotation`` context for host-side spans
  so data loading / checkpointing show up on the trace timeline.
- :class:`StepTimer` : rolling step-time / throughput statistics with
  percentiles, independent of the profiler (always cheap enough to leave on).
"""

import time
from typing import Dict, Optional

import numpy as np


class StepProfiler:
    """Trace a window of steps: call :meth:`step` once per training step."""

    def __init__(self, profile_dir: str, start_step: int, num_steps: int):
        self.dir = profile_dir
        self.start = int(start_step)
        self.stop = int(start_step) + int(num_steps)
        self._active = False

    def step(self, step: int) -> None:
        if not self.dir:
            return
        import jax

        if not self._active and step == self.start:
            jax.profiler.start_trace(self.dir)
            self._active = True
            print(f"[profile] tracing steps {self.start}..{self.stop} -> {self.dir}")
        elif self._active and step >= self.stop:
            jax.profiler.stop_trace()
            self._active = False
            print(f"[profile] trace written to {self.dir}")

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


def annotate(name: str):
    """Named host-side span on the profiler timeline (no-op cost when no
    trace is active)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-duration stats (median / p90 / steps-per-sec)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times = []
        self._t0: Optional[float] = None

    def tic(self) -> None:
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    def stats(self) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        med = float(np.median(t))
        return {
            "step_time_median_s": med,
            "step_time_p90_s": float(np.percentile(t, 90)),
            "steps_per_sec": 1.0 / max(med, 1e-9),
        }
