"""Tracing: logging init + per-stage timing (SURVEY §5.1 parity).

The reference wires the ``tracing`` crate through every layer with a
thread-name-aware subscriber and env-filtered levels (reference
infur/src/main.rs:18-24) and gets decode-side throughput telemetry from
ffmpeg's progress lines (decoder.rs:236-253).  Equivalents here:

* :func:`init_logs` — stdlib logging with thread names, level from
  ``INFUR_LOG`` (default info);
* :class:`StageTimers` — EMA wall-time per pipeline stage, recorded by the
  app composite around each stage.  Device work is asynchronous, so a
  stage's number means "host time until dispatch returned (plus any sync
  the stage performs)"; the end-to-end number is measured at the sink
  where D2H materializes.  For kernel-level truth use
  ``jax.profiler.trace`` (exposed via :func:`profile_trace`).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from dataclasses import dataclass, field


def init_logs(default_level: str = "info") -> None:
    """Configure root logging like the reference's subscriber."""
    level = os.environ.get("INFUR_LOG", default_level).upper()
    logging.basicConfig(
        level=getattr(logging, level, logging.INFO),
        format="%(asctime)s %(levelname).1s [%(threadName)s] "
               "%(name)s: %(message)s",
        datefmt="%H:%M:%S")


@dataclass
class StageTimers:
    """Exponential-moving-average stage timings in milliseconds."""

    alpha: float = 0.2
    ema_ms: dict[str, float] = field(default_factory=dict)
    last_ms: dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            self.last_ms[name] = dt
            prev = self.ema_ms.get(name)
            self.ema_ms[name] = dt if prev is None else \
                prev + self.alpha * (dt - prev)

    def snapshot(self) -> dict[str, float]:
        return {k: round(v, 3) for k, v in self.ema_ms.items()}


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """JAX profiler trace context (TensorBoard-format device traces)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
