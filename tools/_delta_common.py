"""Shared scaffolding for the trained-net serving-delta tools
(measure_directions_delta / measure_v2_delta): synthetic-fixture
training recipe + per-image disagreement / R-P-F1 comparison loop.
One copy so the two measurements can never silently diverge."""

import os
import tempfile
import types

import numpy as np


def train_fixture_net(iters, n_devices=None, exp_name='delta', seed=0,
                      algo='InstaOrderNet_o', n_images=32, val_images=8):
    """Train `algo` (tiny resnet50, layers (1,1,1,1)) on the synthetic
    fixture; returns (params, stats, cfg, reader, va_dir, load_image)
    with the trained checkpoint loaded. `seed` offsets BOTH the fixture
    content seeds and the trainer seed so multi-seed studies
    (study_directions.py) draw independent data + init streams;
    seed=0 reproduces the original single-run tool bit-for-bit."""
    import jax
    from PIL import Image
    from instaorder_tpu.data.synthetic import make_instaorder_fixture
    from instaorder_tpu.data import readers as R
    from instaorder_tpu.train.trainer import Trainer
    from instaorder_tpu.eval.tester import expand_bbox
    from instaorder_tpu.models import resnet
    from instaorder_tpu.core import checkpoint as ckpt_io

    root = tempfile.mkdtemp()
    tr_insta, _, tr_dir = make_instaorder_fixture(
        root + '/tr', n_images=n_images, n_instances=5, h=128, w=160,
        seed=1 + 100 * seed, split='train2017')
    va_insta, _, va_dir = make_instaorder_fixture(
        root + '/va', n_images=val_images, n_instances=5, h=128, w=160,
        seed=2 + 100 * seed, split='val2017')

    num_classes = [2, 3] if algo == 'InstaOrderNet_od' else 2
    args = types.SimpleNamespace()
    args.model = {
        'algo': algo, 'total_iter': iters,
        'lr_steps': [int(iters * 2 / 3)], 'lr_mults': [0.1],
        'lr': 2e-3, 'weight_decay': 1e-4, 'optim': 'SGD',
        'warmup_lr': [], 'warmup_steps': [],
        'backbone_arch': 'resnet50_cls',
        'backbone_param': {'in_channels': 5, 'num_classes': num_classes,
                           'layers_override': [1, 1, 1, 1]},
        'use_rgb': True}
    if algo == 'InstaOrderNet_od':
        args.model['overlap_weight'] = 0.1
        args.model['distinct_weight'] = 0.9
    args.data = {
        'dataset': 'InstaOrder',
        'trainval_dataset': ('SupDepthOccOrderDataset'
                             if algo == 'InstaOrderNet_od'
                             else 'SupOcclusionOrderDataset'),
        'remove_depth_overlap': 0,
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
                    'exp_name': exp_name}
    args.seed = 3 + seed

    trainer = Trainer(args, n_devices=n_devices, out_dir=root + '/out')
    trainer.train()
    ckpt = root + f'/out/checkpoints/ckpt_iter_{iters}.ckpt'

    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=num_classes, layers_override=(1, 1, 1, 1))
    _, params, stats, _ = ckpt_io.load_state(ckpt, params, stats)

    reader = R.InstaOrderReader(va_insta)

    def load_image(idx):
        modal, cat, bboxes, amodal, fn = reader.get_image_instances(
            idx, with_gt=True)[:5]
        image = np.array(Image.open(os.path.join(va_dir, fn))
                         .convert('RGB')).astype(np.float32)
        return image, modal.astype(np.float32), \
            expand_bbox(bboxes, 3.0).astype(np.float32)

    return params, stats, cfg, reader, va_dir, load_image


def compare_predictors(preds, reader, load_image, keys=('a', 'b')):
    """Run each predictor over every val scene; returns
    (disagreement_pct, entries, {key: (recall, precision, f1)})."""
    from instaorder_tpu.eval.metrics import eval_order_recall_precision_f1
    ka, kb = keys
    disagree = total = 0
    rpf = {k: [] for k in keys}
    for idx in range(reader.get_image_length()):
        image, masks, ebb = load_image(idx)
        gt = reader.get_gt_ordering(idx, 'occlusion', 0)
        mats = {}
        for k in keys:
            mats[k] = np.asarray(
                preds[k].infer_occ_order(image, masks, ebb))
            rpf[k].append(
                eval_order_recall_precision_f1(mats[k], gt, 0))
        n = masks.shape[0]
        off = ~np.eye(n, dtype=bool)
        disagree += int((mats[ka][off] != mats[kb][off]).sum())
        total += int(off.sum())
    means = {k: tuple(np.mean(np.array(v), axis=0)) for k, v in
             rpf.items()}
    return 100.0 * disagree / max(total, 1), total, means
