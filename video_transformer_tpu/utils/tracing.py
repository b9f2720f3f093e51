"""Tracing & profiling: structured span events + jax.profiler integration.

The reference's observability is structured ``event=`` log lines around
every model call plus token-usage extraction (content_analyzer.py:1287-1365).
This module keeps that schema and upgrades the backend:

- ``span(name)``: context manager timing a phase, logging
  ``event=span name=<x> elapsed_ms=<t>`` and accumulating per-name stats.
- ``Tracer.summary()``: machine-readable per-span aggregates for reports.
- ``device_trace(dir)``: wraps ``jax.profiler`` to capture XLA traces
  (HLO timelines viewable in TensorBoard/XProf) for kernel-level tuning.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict
from typing import Any, Iterator

__all__ = ["Tracer", "tracer", "span", "device_trace"]


class Tracer:
    """Thread-safe span accumulator."""

    def __init__(self, logger: logging.Logger | None = None):
        self.logger = logger or logging.getLogger("video_transformer")
        self._lock = threading.Lock()
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, **fields: Any) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            elapsed = time.perf_counter() - start
            with self._lock:
                self._totals[name] += elapsed
                self._counts[name] += 1
            extra = " ".join(f"{k}={v}" for k, v in fields.items())
            self.logger.debug(
                f"event=span name={name} elapsed_ms={elapsed * 1000:.1f}"
                + (f" {extra}" if extra else "")
            )

    def summary(self) -> dict[str, dict[str, float]]:
        with self._lock:
            return {
                name: {
                    "total_s": round(self._totals[name], 4),
                    "count": self._counts[name],
                    "mean_ms": round(
                        self._totals[name] / self._counts[name] * 1000, 2
                    ),
                }
                for name in self._totals
            }

    def reset(self) -> None:
        with self._lock:
            self._totals.clear()
            self._counts.clear()


#: Process-global tracer used by engine/analyzer hot paths.
tracer = Tracer()


def span(name: str, **fields: Any):
    """Shorthand for the global tracer's span."""
    return tracer.span(name, **fields)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (XLA timeline) around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
