"""Profiling & performance instrumentation.

The reference had only wall-clock prints (SURVEY.md §5.1).  TPU-native
equivalents:

- ``trace(name)``: jax.profiler trace annotation + wall timing in one
  context manager (annotations show up in Perfetto traces).
- ``capture_trace(dir)``: whole-program profiler capture for Perfetto.
- ``StepTimer``: per-step timing statistics with warmup discard.
- roofline helpers for the SpMM benchmark (edges/s vs HBM bound).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

from protgram_directgcn_tpu.utils.io import logger

# Single-chip HBM bandwidth estimates (bytes/s) by platform generation.
HBM_BANDWIDTH = {
    "tpu_v4": 1.2e12,
    "tpu_v5e": 8.19e11,
    "tpu_v5p": 2.77e12,
    "cpu": 5.0e10,
}


@contextlib.contextmanager
def trace(name: str, log: bool = False):
    """Annotate a region for the JAX profiler and measure wall time."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    if log:
        logger.info("[trace] %s: %.3fs", name, time.perf_counter() - t0)


@contextlib.contextmanager
def capture_trace(log_dir: str):
    """Capture a Perfetto-compatible profiler trace into log_dir."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


@dataclass
class StepTimer:
    """Collects per-step wall times; reports mean/min after warmup."""

    warmup: int = 2
    times: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def steady(self) -> List[float]:
        return self.times[self.warmup :] if len(self.times) > self.warmup else self.times

    def mean(self) -> float:
        s = self.steady
        return sum(s) / len(s) if s else float("nan")

    def best(self) -> float:
        s = self.steady
        return min(s) if s else float("nan")


def spmm_roofline_edges_per_s(feat_dim: int, bandwidth: float, dtype_bytes: int = 4) -> float:
    """HBM-bound edges/s for gather-style SpMM: one feature row per edge."""
    return bandwidth / (dtype_bytes * feat_dim)


def detect_bandwidth() -> float:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return HBM_BANDWIDTH["tpu_v5e"]
    if "v5p" in kind or "v5" in kind:
        return HBM_BANDWIDTH["tpu_v5p"]
    if "v4" in kind:
        return HBM_BANDWIDTH["tpu_v4"]
    if dev.platform == "cpu":
        return HBM_BANDWIDTH["cpu"]
    return HBM_BANDWIDTH["tpu_v5e"]
