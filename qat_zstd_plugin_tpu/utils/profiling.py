"""Profiling/observability hooks (SURVEY §5: tracing & metrics).

The reference's only profiler is its benchmark histogram
(test/benchmark.c:84-169); here:

* `trace(path)` — context manager around jax.profiler for device traces
  (view in TensorBoard/xprof);
* `BlockStats` — per-block latency/size accounting usable from any codec
  path (the per-block structured-stats analog of QZSTD_LOG level 3).
"""

from __future__ import annotations

import contextlib
import threading
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace around a region: with trace('/tmp/tb'): ..."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class BlockStats:
    """Thread-safe per-block accounting."""
    blocks: int = 0
    input_bytes: int = 0
    output_bytes: int = 0
    fallback_blocks: int = 0
    raw_blocks: int = 0
    total_seconds: float = 0.0
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False)

    def record(self, in_bytes: int, out_bytes: int | None,
               seconds: float, fallback: bool = False) -> None:
        with self._lock:
            self.blocks += 1
            self.input_bytes += in_bytes
            if out_bytes is None:
                self.raw_blocks += 1
                self.output_bytes += in_bytes
            else:
                self.output_bytes += out_bytes
            self.total_seconds += seconds
            if fallback:
                self.fallback_blocks += 1

    def summary(self) -> dict:
        with self._lock:
            mbs = (self.input_bytes / self.total_seconds / 1e6
                   if self.total_seconds else 0.0)
            return {
                "blocks": self.blocks,
                "ratio": (self.output_bytes / self.input_bytes
                          if self.input_bytes else 1.0),
                "fallback_blocks": self.fallback_blocks,
                "raw_blocks": self.raw_blocks,
                "throughput_mbs": round(mbs, 1),
            }


class Timer:
    __slots__ = ("t0", "elapsed")

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False
