"""Per-stage timers + optional jax.profiler traces for the prover.

The reference has no observability at all (SURVEY.md §5: one ad-hoc
Instant in a test); this module is the TPU build's replacement. Every
`prove()` records a wall-clock breakdown of its stages into
`last_prove_timings`, and setting FAWKES_PROFILE_DIR captures a
jax.profiler trace of the device portion (viewable in XProf/TensorBoard).

Env:
  FAWKES_TIMINGS=1       print the per-stage breakdown to stderr
  FAWKES_PROFILE_DIR=dir capture a jax.profiler trace per prove()
"""

from __future__ import annotations

import contextlib
import os
import sys
import time
from typing import Dict, Iterator

# Wall-clock breakdown of the most recent prove() call, seconds by stage
# name (witness / spmv_ntt / msm_a / msm_b1 / msm_b2 / msm_l / msm_h /
# host_tail). Read it after prove() for reporting (bench.py does).
last_prove_timings: Dict[str, float] = {}


class StageTimer:
    """Accumulates named wall-clock stages; publishes to
    last_prove_timings on close."""

    def __init__(self, publish: bool = True):
        self.times: Dict[str, float] = {}
        self._publish = publish

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt

    def close(self) -> Dict[str, float]:
        self.times["total"] = sum(
            v for k, v in self.times.items() if k != "total"
        )
        if self._publish:
            last_prove_timings.clear()
            last_prove_timings.update(self.times)
        if os.environ.get("FAWKES_TIMINGS", "") not in ("", "0"):
            parts = " ".join(
                f"{k}={v * 1e3:.1f}ms" for k, v in self.times.items()
            )
            print(f"[fawkes timings] {parts}", file=sys.stderr)
        return self.times


@contextlib.contextmanager
def device_trace(label: str) -> Iterator[None]:
    """jax.profiler trace of the enclosed block when FAWKES_PROFILE_DIR
    is set; no-op (zero overhead) otherwise."""
    trace_dir = os.environ.get("FAWKES_PROFILE_DIR", "")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield
