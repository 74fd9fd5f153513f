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
    """Same schedule as a traced function of a jnp step (usable in jit)."""
    host = step_lr(base_lr, milestones, lr_mults, warmup_lr, warmup_steps)
    milestones = list(milestones)
    ws = list(warmup_steps)
    warmup_end = ws[-1] if ws else 0
    # post-warmup: a step function over milestone regions
    region_probes = [warmup_end] + milestones
    region_vals = np.asarray([host(p) for p in region_probes], np.float32)
    # int32 on purpose: the recipes top out at 86k iters and the no-x64
    # default would silently truncate an int64 anyway (with a warning
    # that drowns real ones in pytest)
    ms = np.asarray(milestones, np.int32) if milestones else np.zeros(
        (0,), np.int32)
    # warmup: piecewise-linear through anchors (0, host(0)) .. (ws_i, ...)
    wx = np.asarray([0] + ws, np.float32)
    wy = np.asarray([host(0)] + [host(s) for s in ws], np.float32)

    def sched(step):
        step_i = jnp.asarray(step, jnp.int32)
        idx = jnp.searchsorted(jnp.asarray(ms), step_i, side='right')
        val = jnp.asarray(region_vals)[idx]
        if ws:
            wval = jnp.interp(step_i.astype(jnp.float32), jnp.asarray(wx),
                              jnp.asarray(wy))
            val = jnp.where(step_i < warmup_end, wval, val)
        return val.astype(jnp.float32)

    return sched
