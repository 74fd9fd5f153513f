#!/usr/bin/env python
"""End-to-end learning-signal validation (no real data needed).

Trains InstaOrderNet_o (trimmed ResNet-50) from scratch on the synthetic
layered-rectangle fixture and evaluates occlusion R/P/F1 on a held-out
fixture before and after: the occludee's visible mask carries the
truncation signature, so the task is learnable from masks alone.

Round-1 measured result (8-virtual-device CPU mesh, 300 iters, ~18 min):
  untrained F1 0.0 -> trained F1 31.5 on held-out scenes.

Usage: python tools/validate_learning.py [--iters 300] [--cpu]
"""

import argparse
import os
import sys
import tempfile
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--cpu', action='store_true',
                    help='force the 8-virtual-device CPU mesh')
    ap.add_argument('--n-devices', type=int, default=None)
    args_cli = ap.parse_args()

    if args_cli.cpu:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') +
            ' --xla_force_host_platform_device_count=8').strip()
    import jax
    if args_cli.cpu:
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np  # noqa: F401
    from instaorder_tpu.data.synthetic import make_instaorder_fixture
    from instaorder_tpu.train.trainer import Trainer
    from instaorder_tpu.eval.tester import Tester

    root = tempfile.mkdtemp()
    tr_insta, _, tr_dir = make_instaorder_fixture(
        root + '/tr', n_images=32, n_instances=5, h=128, w=160, seed=1,
        split='train2017')
    va_insta, _, va_dir = make_instaorder_fixture(
        root + '/va', n_images=8, n_instances=5, h=128, w=160, seed=2,
        split='val2017')

    args = types.SimpleNamespace()
    args.model = {
        'algo': 'InstaOrderNet_o', 'total_iter': args_cli.iters,
        'lr_steps': [int(args_cli.iters * 2 / 3)], 'lr_mults': [0.1],
        'lr': 2e-3, 'weight_decay': 1e-4, 'optim': 'SGD',
        'warmup_lr': [], 'warmup_steps': [],
        'backbone_arch': 'resnet50_cls',
        'backbone_param': {'in_channels': 5, 'num_classes': 2,
                           'layers_override': [1, 1, 1, 1]},
        'use_rgb': True}
    args.data = {
        'dataset': 'InstaOrder',
        'trainval_dataset': 'SupOcclusionOrderDataset',
        'train_image_root': tr_dir, 'train_annot_file': tr_insta,
        'val_image_root': va_dir, 'val_annot_file': va_insta,
        'input_size': 64, 'enlarge_box': 3.0,
        'base_aug': {'flip': True, 'shift': [-0.2, 0.2],
                     'scale': [0.8, 1.2]},
        'load_rgb': True, 'batch_size': 4, 'batch_size_val': 8,
        'workers': 6, 'patch_or_image': 'patch', 'remove_occ_bidirec': 0,
        'use_category': False, 'data_mean': [0.485, 0.456, 0.406],
        'data_std': [0.229, 0.224, 0.225], 'base_dir': root}
    args.trainer = {'initial_val': False, 'val_freq': 10 ** 9,
                    'val_iter': 2, 'print_freq': 100,
                    'save_freq': 10 ** 9, 'loss_record': ['loss'],
                    'exp_name': 'learn_signal'}
    args.seed = 3
    args.order_method = ''
    args.load_model = None

    pre = Tester(args, n_images=8).run()
    t0 = time.time()
    trainer = Trainer(args, n_devices=args_cli.n_devices,
                      out_dir=root + '/out')
    trainer.train()
    args.load_model = (root +
                       f'/out/checkpoints/ckpt_iter_{args_cli.iters}.ckpt')
    post = Tester(args, n_images=8).run()
    print(f"UNTRAINED f1: {pre['f1']:.1f}")
    print(f"TRAINED   f1: {post['f1']:.1f} "
          f"({args_cli.iters} iters, {time.time() - t0:.0f}s)")


if __name__ == '__main__':
    main()
