"""pjit/shard_map train & eval steps.

The reference's hot loop is: forward x2 -> loss/world_size -> backward ->
per-param NCCL all_reduce -> SGD step (trainer.py:158-216 + supervised_
order.py:535-548 + distributed_utils.py:27-31). Here the whole iteration is
ONE compiled program: shard_map over the `data` mesh axis runs the
per-replica forward/backward (per-replica BatchNorm, matching the
reference's unsynced BN), a single fused `lax.pmean` replaces the
per-parameter all-reduce chain, and the optimizer update happens on device.
LR arrives as a scalar argument (schedule stepped on host per iteration,
trainer.py:161).

BN running stats are pmean'd across replicas each step. The reference lets
ranks drift and checkpoints rank 0's stats; the pmean is the same in
expectation and keeps the state single-copy. (Training math is unaffected:
running stats are only read in eval.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..parallel.mesh import DATA_AXIS


def build_train_step(loss_fn, optimizer, mesh):
    """Returns jitted `step(params, stats, opt_state, batch, lr) ->
    (params, stats, opt_state, logs)` with batch sharded over `data`."""

    def _step(params, stats, opt_state, batch, lr):
        def local(params, stats, batch):
            return loss_fn(params, stats, batch, train=True)

        grads, (new_stats, logs) = jax.grad(local, has_aux=True)(
            params, stats, batch)
        grads = jax.lax.pmean(grads, DATA_AXIS)
        new_stats = jax.lax.pmean(new_stats, DATA_AXIS)
        logs = jax.lax.pmean(logs, DATA_AXIS)
        new_params, new_opt = optimizer.update(grads, opt_state, params, lr)
        return new_params, new_stats, new_opt, logs

    sharded = shard_map(
        _step, mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2))


def build_eval_step(loss_fn, mesh):
    """forward_only: pmean'd loss logs, no grad, eval-mode BN
    (reference Trainer.validate, trainer.py:218-266)."""

    def _step(params, stats, batch):
        loss, (_, logs) = loss_fn(params, stats, batch, train=False)
        return jax.lax.pmean(logs, DATA_AXIS)

    sharded = shard_map(
        _step, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(sharded)


def build_forward(apply_fn, cfg, mesh=None, train=False):
    """Jitted plain forward over an optionally pair-sharded batch."""
    def fwd(params, stats, x):
        out, _ = apply_fn(params, stats, cfg, x, train=train)
        return out

    if mesh is None:
        return jax.jit(fwd)
    sharded = shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)
