"""Profiling / FLOPs tooling (SURVEY.md §5 aux subsystems).

The reference's only profiling is a latent mmcv FLOPs counter
(extra_tools/get_flops.py, which even lacks the forward_dummy it needs).
TPU-native equivalents:

- :func:`flops_of` — XLA's own cost analysis of a jitted function
  (replaces get_model_complexity_info);
- :func:`trace_context` — jax.profiler trace scope producing TensorBoard/
  Perfetto traces (replaces torch profiler / NVTX, which the reference
  doesn't have);
- :class:`StepTimer` — EMA step timing for train-loop logging.
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


def flops_of(fn: Callable, *args, **kwargs) -> dict:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
        "peak_memory_bytes": float(
            getattr(compiled, "memory_analysis", lambda: None)()
            .temp_size_in_bytes
            if compiled.memory_analysis() is not None else -1),
    }


@contextlib.contextmanager
def trace_context(logdir: str):
    """``with trace_context('/tmp/trace'):`` -> TensorBoard trace."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._t = None
        self.dt: Optional[float] = None

    def tick(self):
        now = time.perf_counter()
        if self._t is not None:
            d = now - self._t
            self.dt = d if self.dt is None else \
                self.ema * self.dt + (1 - self.ema) * d
        self._t = now

    @property
    def steps_per_sec(self):
        return 1.0 / self.dt if self.dt else float("nan")
