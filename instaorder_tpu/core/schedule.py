"""Learning-rate schedule: piecewise-linear warmup + step decay.

Pure-function port of the reference's StepLRScheduler
(utils/scheduler.py:58-109): optionally several linear warmup segments
(warmup_steps[i] -> warmup_lr[i]), then step decay at `milestones` with
cumulative `lr_mults`. The trainer calls it per iteration with the
explicit step index (reference trainer.py:161), so resume is exact.

Returned as both a python float fn (host logging) and an optax-compatible
schedule (jnp scalar in, works inside jit).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def step_lr(base_lr: float,
            milestones: Sequence[int],
            lr_mults: Sequence[float],
            warmup_lr: Sequence[float] = (),
            warmup_steps: Sequence[int] = ()):
    """Returns lr(step) implementing reference StepLRScheduler semantics."""
    milestones = list(milestones)
    lr_mults = list(lr_mults)
    warmup_lr = list(warmup_lr)
    warmup_steps = list(warmup_steps)
    assert len(milestones) == len(lr_mults)
    assert milestones == sorted(milestones)
    assert len(warmup_lr) == len(warmup_steps)
    mults_cum = [1.0]
    for m in lr_mults:
        mults_cum.append(mults_cum[-1] * m)

    def lr(step: int) -> float:
        pos = bisect_right(warmup_steps, step)
        if pos < len(warmup_steps):
            if pos == 0:
                cur = base_lr + step * (warmup_lr[0] - base_lr) / warmup_steps[0]
            else:
                span = warmup_steps[pos] - warmup_steps[pos - 1]
                cur = warmup_lr[pos - 1] + (step - warmup_steps[pos - 1]) * (
                    warmup_lr[pos] - warmup_lr[pos - 1]) / span
            return float(cur)
        pos = bisect_right(milestones, step)
        if not warmup_lr:
            return float(base_lr * mults_cum[pos])
        return float(warmup_lr[-1] * mults_cum[pos])

    return lr


def step_lr_jnp(base_lr, milestones, lr_mults, warmup_lr=(), warmup_steps=()):
    """Same schedule as a traced function of a jnp step (for optax)."""
    host = step_lr(base_lr, milestones, lr_mults, warmup_lr, warmup_steps)
    # precompute lr at every boundary; inside jit select by comparisons.
    milestones = list(milestones)
    bounds = list(warmup_steps) + milestones

    def sched(step):
        step_i = jnp.asarray(step, jnp.int32)
        if not bounds:
            return jnp.asarray(host(0), jnp.float32)
        # warmup: piecewise linear between anchor points
        ws = list(warmup_steps)
        anchors_x = [0] + ws
        anchors_y = [host(0)] + [host(s) for s in ws]
        lr_val = jnp.asarray(host(max(bounds) + 1), jnp.float32)
        # post-warmup step decay regions, from last to first
        regions = ([max(ws) if ws else 0] + milestones) if milestones else [0]
        for i in range(len(milestones), -1, -1):
            lo = (milestones[i - 1] if i > 0 else (ws[-1] if ws else 0))
            probe = lo  # lr constant in [lo, next milestone)
            lr_val = jnp.where(step_i >= lo,
                               jnp.asarray(host(probe), jnp.float32), lr_val)
        # warmup region overrides
        if ws:
            t = step_i.astype(jnp.float32)
            for i in range(len(ws) - 1, -1, -1):
                x0 = anchors_x[i]
                x1 = anchors_x[i + 1]
                y0 = anchors_y[i]
                y1 = anchors_y[i + 1]
                seg = y0 + (t - x0) * (y1 - y0) / max(x1 - x0, 1)
                lr_val = jnp.where(step_i < x1, seg.astype(jnp.float32),
                                   lr_val)
        return lr_val

    return sched
