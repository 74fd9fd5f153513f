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
    ap.add_argument('--with-loader', action='store_true',
                    help='feed the step from the real host input '
                         'pipeline (synthetic fixture -> '
                         'SupOcclusionOrderDataset cv2 path -> threaded '
                         'DataLoader) and report the data-stall '
                         'fraction vs device-only')
    ap.add_argument('--workers', type=int, default=6)
    ap.add_argument('--loader-mode', default='thread',
                    choices=['thread', 'process'])
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

    out = {
        'metric': 'train_step_ms',
        'value': round(best * 1e3, 1),
        'steps_per_s': round(1 / best, 2),
        'samples_per_s': round(args.batch / best, 1),
        'ref_86k_iters_hours': round(86000 * best / 3600, 2),
        'batch': args.batch, 'size': args.size, 'dtype': args.dtype,
        'n_devices': mesh.devices.size,
    }

    if args.with_loader:
        # VERDICT r2 item 6: prove the host pipeline can feed the step.
        # Synthetic fixture -> the real SupOcclusionOrderDataset cv2
        # crop/resize path -> threaded DataLoader -> device batches.
        import tempfile
        from instaorder_tpu.data.synthetic import make_instaorder_fixture
        from instaorder_tpu.data.datasets import SupOcclusionOrderDataset
        from instaorder_tpu.data.loader import DataLoader
        from instaorder_tpu.data.sampler import GivenIterationSampler

        root = tempfile.mkdtemp()
        insta, _, img_dir = make_instaorder_fixture(
            root, n_images=32, n_instances=8, h=480, w=640, seed=0,
            split='train2017')
        dcfg = {
            'dataset': 'InstaOrder', 'train_image_root': img_dir,
            'train_annot_file': insta, 'input_size': args.size,
            'enlarge_box': 3.0,
            'base_aug': {'flip': True, 'shift': [-0.2, 0.2],
                         'scale': [0.8, 1.2]},
            'load_rgb': True, 'patch_or_image': 'patch',
            'remove_occ_bidirec': 0, 'use_category': False,
            'data_mean': [0.485, 0.456, 0.406],
            'data_std': [0.229, 0.224, 0.225]}
        ds = SupOcclusionOrderDataset(dcfg, 'train', 'InstaOrderNet_o')
        n_iters = args.iters * args.repeats + 4

        def make_loader():
            return DataLoader(
                ds, GivenIterationSampler(len(ds), n_iters, args.batch),
                batch_size=args.batch, num_workers=args.workers,
                prefetch=8, seed=0, mode=args.loader_mode)

        # (a) host-only: loader drain rate
        it = iter(make_loader())
        next(it)                       # warm the pool
        t0 = time.perf_counter()
        drained = 0
        for _ in range(args.iters):
            next(it)
            drained += 1
        host_dt = (time.perf_counter() - t0) / drained
        del it

        # (b) end-to-end: loader feeding the compiled step
        def to_batch(np_batch):
            return shard_batch({
                'rgb': jnp.asarray(np_batch['rgb']),
                'modal1': jnp.asarray(np_batch['modal1']),
                'modal2': jnp.asarray(np_batch['modal2']),
                'occ_order': jnp.asarray(np_batch['occ_order'],
                                         jnp.float32)}, mesh)

        it = iter(make_loader())
        b = to_batch(next(it))
        k += 1
        params, stats, opt_state, logs = step(params, stats, opt_state,
                                              b, 1e-3 + k * 1e-9)
        float(jax.device_get(logs['loss']))
        t0 = time.perf_counter()
        n_e2e = 0
        for np_batch in it:
            k += 1
            params, stats, opt_state, logs = step(
                params, stats, opt_state, to_batch(np_batch),
                1e-3 + k * 1e-9)
            n_e2e += 1
            if n_e2e >= args.iters * 2:
                break
        float(jax.device_get(logs['loss']))
        e2e_dt = (time.perf_counter() - t0) / n_e2e

        out.update({
            'loader_samples_per_s': round(args.batch / host_dt, 1),
            'e2e_step_ms': round(e2e_dt * 1e3, 1),
            'e2e_samples_per_s': round(args.batch / e2e_dt, 1),
            'data_stall_frac': round(max(0.0, 1.0 - best / e2e_dt), 3),
            'workers': args.workers,
            'loader_mode': args.loader_mode,
            'host_cores': os.cpu_count(),
        })

    print(json.dumps(out))


if __name__ == '__main__':
    main()
