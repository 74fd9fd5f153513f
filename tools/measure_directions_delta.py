#!/usr/bin/env python
"""Measure the directions=1 serving knob's accuracy delta on a TRAINED
net (VERDICT r2 item 4).

The swap ensemble (inference.py:196-214) averages the two mask-order
forwards; training with swap-label-permute augmentation teaches
f(swap(x)) ~ f(x)[:, ::-1], so on a trained net the single-direction
knob should be near-lossless. Random-weight fixtures cannot show this
(their two directions are uncorrelated — the e2e parity test measures
12-50%% disagreement there); this tool trains InstaOrderNet_o on the
synthetic fixture first, then reports the real delta, which README
"Serving knobs" documents.

Usage: python tools/measure_directions_delta.py [--iters 300] [--cpu]
Prints one JSON line {disagreement_pct, d1_f1, d2_f1, ...}.
"""

import argparse
import json
import os
import sys
import tempfile
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--n-devices', type=int, default=None)
    cli = ap.parse_args()

    if cli.cpu:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') +
            ' --xla_force_host_platform_device_count=8').strip()
    import jax
    if cli.cpu:
        jax.config.update('jax_platforms', 'cpu')

    import numpy as np
    from PIL import Image
    from instaorder_tpu.data.synthetic import make_instaorder_fixture
    from instaorder_tpu.data import readers as R
    from instaorder_tpu.train.trainer import Trainer
    from instaorder_tpu.eval.tester import expand_bbox
    from instaorder_tpu.eval.pipeline import OrderPredictor
    from instaorder_tpu.eval.metrics import eval_order_recall_precision_f1
    from instaorder_tpu.models import resnet
    from instaorder_tpu.core import checkpoint as ckpt_io

    root = tempfile.mkdtemp()
    tr_insta, _, tr_dir = make_instaorder_fixture(
        root + '/tr', n_images=32, n_instances=5, h=128, w=160, seed=1,
        split='train2017')
    va_insta, _, va_dir = make_instaorder_fixture(
        root + '/va', n_images=8, n_instances=5, h=128, w=160, seed=2,
        split='val2017')

    args = types.SimpleNamespace()
    args.model = {
        'algo': 'InstaOrderNet_o', 'total_iter': cli.iters,
        'lr_steps': [int(cli.iters * 2 / 3)], 'lr_mults': [0.1],
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
                    'exp_name': 'directions_delta'}
    args.seed = 3

    trainer = Trainer(args, n_devices=cli.n_devices, out_dir=root + '/out')
    trainer.train()
    ckpt = root + f'/out/checkpoints/ckpt_iter_{cli.iters}.ckpt'

    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    _, params, stats, _ = ckpt_io.load_state(ckpt, params, stats)

    preds = {d: OrderPredictor(resnet.apply, cfg, params, stats,
                               'InstaOrderNet_o', patch_or_image='patch',
                               input_size=64, directions=d)
             for d in (1, 2)}

    reader = R.InstaOrderReader(va_insta)
    disagree = total = 0
    rpf = {1: [], 2: []}
    for idx in range(reader.get_image_length()):
        modal, cat, bboxes, amodal, fn = reader.get_image_instances(
            idx, with_gt=True)[:5]
        image = np.array(Image.open(os.path.join(va_dir, fn))
                         .convert('RGB')).astype(np.float32)
        ebb = expand_bbox(bboxes, 3.0).astype(np.float32)
        gt = reader.get_gt_ordering(idx, 'occlusion', 0)
        mats = {}
        for d, pred in preds.items():
            mats[d] = pred.infer_occ_order(image,
                                           modal.astype(np.float32), ebb)
            rpf[d].append(eval_order_recall_precision_f1(mats[d], gt, 0))
        n = modal.shape[0]
        off = ~np.eye(n, dtype=bool)
        disagree += int((mats[1][off] != mats[2][off]).sum())
        total += int(off.sum())

    m1 = np.mean(np.array(rpf[1]), axis=0)
    m2 = np.mean(np.array(rpf[2]), axis=0)
    print(json.dumps({
        'iters': cli.iters,
        'disagreement_pct': round(100.0 * disagree / max(total, 1), 2),
        'entries': total,
        'd2_recall': round(float(m2[0]), 2),
        'd2_precision': round(float(m2[1]), 2),
        'd2_f1': round(float(m2[2]), 2),
        'd1_recall': round(float(m1[0]), 2),
        'd1_precision': round(float(m1[1]), 2),
        'd1_f1': round(float(m1[2]), 2),
        'delta_f1': round(float(m1[2] - m2[2]), 2),
    }))


if __name__ == '__main__':
    main()
