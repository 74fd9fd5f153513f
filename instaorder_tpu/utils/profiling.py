"""Tracing / profiling helpers (aux subsystem the reference lacks,
SURVEY.md §5: only AverageMeter wall-clock timers there).

- `trace(dir)` context: captures a jax.profiler trace viewable in
  TensorBoard / Perfetto.
- `StepTimer`: wall-clock per-step timing with device sync, windowed
  stats; drop-in where the reference used AverageMeter pairs.
- `flops_estimate`: analytic cost of the flagship pair pipeline, for MFU
  accounting in bench logs.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window=20):
        self.window = window
        self.times = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            del self.times[0]
        return dt

    @property
    def avg(self):
        return sum(self.times) / max(len(self.times), 1)


def resnet50_flops(h, w, in_channels=5):
    """Approximate fwd FLOPs of ResNet-50 at (h, w) input (2*MACs)."""
    base_224 = 4.1e9  # 3-channel 224x224
    scale = (h * w) / (224 * 224)
    stem_extra = 2 * (h // 2) * (w // 2) * 64 * 49 * (in_channels - 3)
    return base_224 * scale + stem_extra


def pairs_per_sec_mfu(pairs_per_sec, input_size=256, peak_tflops=197.0):
    """MFU of the siamese pair pipeline at a measured throughput."""
    flops_per_pair = 2 * resnet50_flops(input_size, input_size)
    return pairs_per_sec * flops_per_pair / (peak_tflops * 1e12)
