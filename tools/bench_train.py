#!/usr/bin/env python
"""Training-step throughput benchmark (device step only; the input
pipeline is benchmarked by the loader's own determinism/throughput
tests).

Runs the flagship InstaOrderNet_o recipe's compiled train step
(reference experiments/InstaOrder/InstaOrderNet_o/config.yaml: batch 32,
256^2 patches, SGD) on synthetic device-resident batches and prints one
JSON line: steps/s, pairs (samples)/s, and projected wall-clock for the
reference's 86k-iteration schedule.

Usage: python tools/bench_train.py [--batch 32] [--size 256]
       [--dtype bf16] [--iters 30] [--cpu]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=32)
    ap.add_argument('--size', type=int, default=256)
    ap.add_argument('--dtype', default='bf16', choices=['bf16', 'f32'])
    ap.add_argument('--iters', type=int, default=30)
    ap.add_argument('--repeats', type=int, default=3)
    ap.add_argument('--cpu', action='store_true')
    args = ap.parse_args()

    if args.cpu:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') +
            ' --xla_force_host_platform_device_count=8').strip()
    import jax
    if args.cpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    import numpy as np
    import jax.numpy as jnp
    from instaorder_tpu.models import resnet
    from instaorder_tpu.train.algos import make_loss
    from instaorder_tpu.train.optim import make_optimizer
    from instaorder_tpu.train.step import build_train_step
    from instaorder_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    params, stats, cfg = resnet.init(jax.random.PRNGKey(0),
                                     arch='resnet50', in_channels=5,
                                     num_classes=2, weight_init='xavier')
    model_cfg = {'algo': 'InstaOrderNet_o', 'use_rgb': True}
    if args.dtype == 'bf16':
        model_cfg['compute_dtype'] = 'bf16'
    loss_fn = make_loss('InstaOrderNet_o', resnet.apply, cfg, model_cfg)
    optimizer = make_optimizer('SGD', weight_decay=1e-4)
    opt_state = optimizer.init(params)
    step = build_train_step(loss_fn, optimizer, mesh)

    rng = np.random.RandomState(0)
    B, S = args.batch, args.size
    batch = {
        'rgb': jnp.asarray(rng.randn(B, S, S, 3), jnp.float32),
        'modal1': jnp.asarray((rng.rand(B, S, S) > .7), jnp.float32),
        'modal2': jnp.asarray((rng.rand(B, S, S) > .7), jnp.float32),
        'occ_order': jnp.asarray(rng.randint(0, 2, (B, 2)),
                                 jnp.float32),
    }
    batch = shard_batch(batch, mesh)

    # NB: vary lr per call — with donated buffers the argument buffer ids
    # repeat, and identical (executable, args) re-executions can be served
    # from cache through the remote tunnel (CLAUDE.md measurement notes)
    k = 0
    for _ in range(3):
        k += 1
        params, stats, opt_state, logs = step(params, stats, opt_state,
                                              batch, 1e-3 + k * 1e-9)
    float(jax.device_get(logs['loss']))
    best = float('inf')
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            k += 1
            params, stats, opt_state, logs = step(
                params, stats, opt_state, batch, 1e-3 + k * 1e-9)
        float(jax.device_get(logs['loss']))  # force real completion
        best = min(best, (time.perf_counter() - t0) / args.iters)

    print(json.dumps({
        'metric': 'train_step_ms',
        'value': round(best * 1e3, 1),
        'steps_per_s': round(1 / best, 2),
        'samples_per_s': round(args.batch / best, 1),
        'ref_86k_iters_hours': round(86000 * best / 3600, 2),
        'batch': args.batch, 'size': args.size, 'dtype': args.dtype,
        'n_devices': mesh.devices.size,
    }))


if __name__ == '__main__':
    main()
