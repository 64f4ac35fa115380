"""Tracing / profiling subsystem.

The reference had none beyond timestamp prints [SURVEY §5 "Tracing"].  Here:
`jax.profiler` traces viewable in TensorBoard/XProf, named scopes around the
message-passing stages, and a roofline helper for the per-kernel
speed-of-light check [B:L5].
"""
from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax

# v5e (TPU v5 lite) single-chip peaks — the roofline constants used by the
# speed-of-light reports.  bf16 MXU ~197 TFLOP/s, f32 ~half; HBM ~819 GB/s.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 98.5e12
V5E_HBM_GBPS = 819e9


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Profile the enclosed region into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


scope = jax.named_scope  # re-export: annotate MP-loop stages


def roofline(flops: float, bytes_moved: float, seconds: float,
             peak_flops: float = V5E_PEAK_BF16_FLOPS,
             peak_bw: float = V5E_HBM_GBPS) -> dict:
    """Fraction of speed-of-light achieved for a measured region."""
    t_compute = flops / peak_flops
    t_memory = bytes_moved / peak_bw
    bound = "compute" if t_compute >= t_memory else "memory"
    sol = max(t_compute, t_memory)
    return {
        "achieved_tflops": flops / seconds / 1e12,
        "achieved_gbps": bytes_moved / seconds / 1e9,
        "bound": bound,
        "speed_of_light_s": sol,
        "fraction_of_sol": sol / seconds if seconds else 0.0,
    }


class StepTimer:
    """Rolling wall-clock timer for steady-state step measurement."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._last = None
        self._count = 0

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    @property
    def mean_s(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0
