"""Tracing / profiling helpers.

The reference has no profiling hooks (SURVEY.md section 5.1); here we add
first-class ones: `trace` wraps a region in a jax.profiler trace (viewable
in TensorBoard / Perfetto), and `StepTimer` collects per-phase wall-clock
with device synchronization for quick CLI printouts.
"""

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
  """jax.profiler trace context; no-op when log_dir is None."""
  if log_dir is None:
    yield
    return
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class StepTimer:
  """Accumulates per-phase timings with forced device sync."""

  def __init__(self):
    self._totals: Dict[str, float] = defaultdict(float)
    self._counts: Dict[str, int] = defaultdict(int)

  @contextlib.contextmanager
  def phase(self, name: str, sync=None):
    t0 = time.perf_counter()
    yield
    if sync is not None:
      jax.block_until_ready(sync)
    self._totals[name] += time.perf_counter() - t0
    self._counts[name] += 1

  def summary(self) -> Dict[str, float]:
    return {name: self._totals[name] / max(self._counts[name], 1)
            for name in self._totals}

  def report(self) -> str:
    return ' | '.join(f'{k}: {v * 1000:.2f}ms'
                      for k, v in sorted(self.summary().items()))
