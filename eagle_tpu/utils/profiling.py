"""Profiling & observability — the reference's `Timer` grown up.

The reference's only tracing tool is a cuda-synchronize context manager
(/root/reference/eagle/model/utils.py:24-35) plus ad-hoc `time.time()` in
eval scripts. Here:

- `Timer`: block-until-ready wall-clock context manager (works under jit
  boundaries by synchronizing the device queue).
- `RoundMetrics`: running τ / acceptance histogram / rate counters, the
  first-class per-round metrics SURVEY.md §5 calls for.
- `trace(...)`: thin wrapper over jax.profiler for capturing device traces
  viewable in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict

import jax


class Timer:
    """`with Timer("verify") as t:` — t.ms after exit; device-synchronized."""

    def __init__(self, name: str = "", sync: bool = True):
        self.name = name
        self.sync = sync
        self.ms = 0.0

    def __enter__(self):
        if self.sync:
            _sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            _sync()
        self.ms = (time.perf_counter() - self._t0) * 1e3
        return False


def _sync():
    # effectively a device-queue barrier: a no-op computation forced to complete
    jax.device_put(0.0).block_until_ready()


@dataclass
class RoundMetrics:
    """Accumulates per-round speculative-decoding statistics."""

    rounds: int = 0
    new_tokens: int = 0
    wall_s: float = 0.0
    accept_hist: Dict[int, int] = field(default_factory=dict)

    def record(self, accept_len: int, dt_s: float = 0.0):
        self.rounds += 1
        self.new_tokens += accept_len + 1
        self.wall_s += dt_s
        self.accept_hist[accept_len] = self.accept_hist.get(accept_len, 0) + 1

    @property
    def tau(self) -> float:
        return self.new_tokens / self.rounds if self.rounds else 0.0

    @property
    def tokens_per_s(self) -> float:
        return self.new_tokens / self.wall_s if self.wall_s else 0.0

    def summary(self) -> dict:
        return {
            "rounds": self.rounds,
            "new_tokens": self.new_tokens,
            "tau": self.tau,
            "tokens_per_s": self.tokens_per_s,
            "accept_hist": dict(sorted(self.accept_hist.items())),
        }


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler device trace (open with xprof/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation for marking named regions inside traced programs."""
    return jax.profiler.TraceAnnotation(name)
