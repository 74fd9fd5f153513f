#!/usr/bin/env python
"""Measure the boundary-int8 v2 serving default's accuracy delta vs the
f32 predictor on a TRAINED net (companion to measure_directions_delta:
random-weight fixtures put logits at the decision threshold, overstating
quantization flips; a trained net shows the real serving delta that the
bench default `--dtype int8` implies).

Trains InstaOrderNet_o on the synthetic fixture, converts to the v2
predictor (make_v2_predictor, calibrated on held-out pair batches), and
reports matrix disagreement + R/P/F1 deltas vs f32.

Usage: python tools/measure_v2_delta.py [--iters 300] [--cpu]
Prints one JSON line.
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
    from instaorder_tpu.eval.pipeline import (OrderPredictor,
                                              make_v2_predictor)
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
                    'exp_name': 'v2_delta'}
    args.seed = 3

    trainer = Trainer(args, n_devices=cli.n_devices, out_dir=root + '/out')
    trainer.train()
    ckpt = root + f'/out/checkpoints/ckpt_iter_{cli.iters}.ckpt'

    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    _, params, stats, _ = ckpt_io.load_state(ckpt, params, stats)

    reader = R.InstaOrderReader(va_insta)

    def load_image(idx):
        modal, cat, bboxes, amodal, fn = reader.get_image_instances(
            idx, with_gt=True)[:5]
        image = np.array(Image.open(os.path.join(va_dir, fn))
                         .convert('RGB')).astype(np.float32)
        return image, modal.astype(np.float32), \
            expand_bbox(bboxes, 3.0).astype(np.float32)

    pred_f32 = OrderPredictor(resnet.apply, cfg, params, stats,
                              'InstaOrderNet_o', patch_or_image='patch',
                              input_size=64)
    # calibrate the v2 predictor on the first val images' pair batches
    # (held-out data, the PTQ recipe in models/quantize.py)
    import jax.numpy as jnp
    from instaorder_tpu.ops.pairs import all_pair_indices
    calib = []
    for idx in range(2):
        image, masks, ebb = load_image(idx)
        pi, _ = all_pair_indices(masks.shape[0])
        x, _ = pred_f32._build_batch(jnp.asarray(image), jnp.asarray(masks),
                                     jnp.asarray(ebb), jnp.asarray(pi))
        calib.append(np.asarray(x, np.float32))
    pred_v2 = make_v2_predictor(params, stats, cfg, 'InstaOrderNet_o',
                                calib, patch_or_image='patch',
                                input_size=64)

    disagree = total = 0
    rpf = {'f32': [], 'v2': []}
    for idx in range(reader.get_image_length()):
        image, masks, ebb = load_image(idx)
        gt = reader.get_gt_ordering(idx, 'occlusion', 0)
        m_f = pred_f32.infer_occ_order(image, masks, ebb)
        m_v = pred_v2.infer_occ_order(image, masks, ebb)
        rpf['f32'].append(eval_order_recall_precision_f1(m_f, gt, 0))
        rpf['v2'].append(eval_order_recall_precision_f1(m_v, gt, 0))
        n = masks.shape[0]
        off = ~np.eye(n, dtype=bool)
        disagree += int((np.asarray(m_f)[off] != np.asarray(m_v)[off]).sum())
        total += int(off.sum())

    mf = np.mean(np.array(rpf['f32']), axis=0)
    mv = np.mean(np.array(rpf['v2']), axis=0)
    print(json.dumps({
        'iters': cli.iters,
        'disagreement_pct': round(100.0 * disagree / max(total, 1), 2),
        'entries': total,
        'f32_recall': round(float(mf[0]), 2),
        'f32_precision': round(float(mf[1]), 2),
        'f32_f1': round(float(mf[2]), 2),
        'v2_recall': round(float(mv[0]), 2),
        'v2_precision': round(float(mv[1]), 2),
        'v2_f1': round(float(mv[2]), 2),
        'delta_f1': round(float(mv[2] - mf[2]), 2),
    }))


if __name__ == '__main__':
    main()
