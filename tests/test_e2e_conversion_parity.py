"""Metric-level end-to-end conversion parity (VERDICT r1 task 4).

A torch reference-style InstaOrderNet_o checkpoint is evaluated two ways
on the same synthetic InstaOrder fixture:

  1. torch oracle loop that mirrors the reference Tester exactly
     (tools/test.py:402-495 patch mode -> inference.py:443-512
     infer_order_sup_occ -> net_forward_occ:196-215), with cv2
     preprocessing on host;
  2. reference-format .pth.tar -> compat conversion -> our Tester
     (batched on-device pipeline).

The per-image occlusion matrices and the final R/P/F1 must be identical.
"""

import os
import types

import cv2
import numpy as np
import torch
import pytest

from torch_ref import TorchResNetCls

from instaorder_tpu.data.synthetic import make_instaorder_fixture
from instaorder_tpu.data import readers as R
from instaorder_tpu.eval.metrics import eval_order_recall_precision_f1
from instaorder_tpu.eval.tester import Tester, expand_bbox
from instaorder_tpu.utils.geometry import crop_padding

DATA_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
DATA_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _torch_infer_occ_matrix(model, image, inmodal, bboxes, input_size):
    """Reference infer_order_sup_occ, patch mode (inference.py:443-512)."""
    num = inmodal.shape[0]
    order = np.zeros((num, num), int)
    for i in range(num):
        for j in range(i + 1, num):
            bb = bboxes[(i, j), :]
            l, u = bb[:, 0].min(), bb[:, 1].min()
            r = (bb[:, 0] + bb[:, 2]).max()
            b = (bb[:, 1] + bb[:, 3]).max()
            bbox = np.array([l, u, r - l, b - u])
            cx = bbox[0] + bbox[2] / 2.0
            cy = bbox[1] + bbox[3] / 2.0
            size = max(np.sqrt(bbox[2] * bbox[3] * 2.0),
                       bbox[2] * 1.1, bbox[3] * 1.1)
            nb = [int(cx - size / 2.0), int(cy - size / 2.0),
                  int(size), int(size)]
            rgb = cv2.resize(crop_padding(image, nb, pad_value=(0, 0, 0)),
                             (input_size, input_size),
                             interpolation=cv2.INTER_CUBIC)
            m_i = cv2.resize(crop_padding(inmodal[i], nb, pad_value=(0,)),
                             (input_size, input_size),
                             interpolation=cv2.INTER_NEAREST)
            m_j = cv2.resize(crop_padding(inmodal[j], nb, pad_value=(0,)),
                             (input_size, input_size),
                             interpolation=cv2.INTER_NEAREST)
            rgb_t = torch.from_numpy(
                ((rgb.astype(np.float32) / 255.0 - DATA_MEAN) / DATA_STD)
                .transpose(2, 0, 1)).unsqueeze(0)
            t_i = torch.from_numpy(m_i.astype(np.float32))[None, None]
            t_j = torch.from_numpy(m_j.astype(np.float32))[None, None]
            with torch.no_grad():
                o1 = torch.sigmoid(model(torch.cat([t_i, t_j, rgb_t], 1)))
                o2 = torch.sigmoid(model(torch.cat([t_j, t_i, rgb_t], 1)))
            p_ij = (o1[0, 1] + o2[0, 0]).item() / 2
            p_ji = (o1[0, 0] + o2[0, 1]).item() / 2
            if p_ij > 0.5:
                order[i, j] = 1
            if p_ji > 0.5:
                order[j, i] = 1
    return order


def test_converted_checkpoint_matches_torch_tester(tmp_path):
    tm = TorchResNetCls(layers=(1, 1, 1, 1), in_channels=5, num_classes=2)
    with torch.no_grad():  # polarise logits away from the 0.5 threshold
        tm.fc.weight.mul_(4.0)
    tm.eval()
    pth = str(tmp_path / 'InstaOrder_InstaOrderNet_o.pth.tar')
    torch.save({'step': 7, 'state_dict': {
        f'module.{k}': v for k, v in tm.state_dict().items()},
        'optimizer': {}}, pth)

    root = str(tmp_path / 'fix')
    os.makedirs(root)
    insta, _, img_dir = make_instaorder_fixture(root)

    # --- torch oracle over the same reader/fixture ------------------------
    from PIL import Image
    reader = R.InstaOrderReader(insta)
    input_size = 64
    oracle_mats, oracle_rpf = [], []
    for idx in range(reader.get_image_length()):
        modal, cat, bboxes, amodal, fn = reader.get_image_instances(
            idx, with_gt=True)[:5]
        image = np.array(Image.open(os.path.join(img_dir, fn))
                         .convert('RGB'))
        ebb = expand_bbox(bboxes, 3.0)
        gt = reader.get_gt_ordering(idx, 'occlusion', 0)
        pred = _torch_infer_occ_matrix(tm, image, modal, ebb, input_size)
        oracle_mats.append(pred)
        oracle_rpf.append(eval_order_recall_precision_f1(pred, gt, 0))

    # --- our Tester on the converted checkpoint ---------------------------
    # (convert_cli.convert drives the same functions with the full-depth
    # released archs; the trimmed test net goes through the API directly)
    import jax
    from instaorder_tpu.compat.torch_convert import convert_checkpoint
    from instaorder_tpu.core import checkpoint as ckpt_io
    from instaorder_tpu.models import resnet
    _, _, cfg = resnet.init(jax.random.PRNGKey(0), arch='resnet50',
                            in_channels=5, num_classes=2,
                            layers_override=(1, 1, 1, 1))
    cparams, cstats, step = convert_checkpoint(pth, cfg, 'resnet')
    assert step == 7
    ours_ckpt = ckpt_io.save_state(str(tmp_path), step, cparams, cstats)

    args = types.SimpleNamespace()
    args.model = {'algo': 'InstaOrderNet_o',
                  'backbone_arch': 'resnet50_cls',
                  'backbone_param': {'in_channels': 5, 'num_classes': 2,
                                     'layers_override': (1, 1, 1, 1)},
                  'use_rgb': True}
    args.data = {'dataset': 'InstaOrder',
                 'trainval_dataset': 'SupOcclusionOrderDataset',
                 'val_image_root': img_dir, 'val_annot_file': insta,
                 'input_size': input_size, 'enlarge_box': 3.0,
                 'patch_or_image': 'patch', 'remove_occ_bidirec': 0,
                 'use_category': False}
    args.trainer = {}
    args.order_method = ''
    args.load_model = ours_ckpt
    tester = Tester(args)
    tester.prepare_model()

    ours_rs, ours_ps, ours_f1s = [], [], []
    for idx in range(reader.get_image_length()):
        modal, cat, ebb, amodal, fn, image = tester._load_scene(idx)
        gt = tester._gt_occ(idx, modal, amodal)
        pred = tester._predict_occ(image, modal, ebb, cat)
        np.testing.assert_array_equal(
            pred, oracle_mats[idx],
            err_msg=f'occ matrix mismatch on image {idx}')
        r, p, f1 = eval_order_recall_precision_f1(pred, gt, 0)
        ours_rs.append(r)
        ours_ps.append(p)
        ours_f1s.append(f1)

    want = np.array(oracle_rpf)
    np.testing.assert_allclose(np.mean(ours_rs), want[:, 0].mean(), atol=0)
    np.testing.assert_allclose(np.mean(ours_ps), want[:, 1].mean(), atol=0)
    np.testing.assert_allclose(np.mean(ours_f1s), want[:, 2].mean(), atol=0)


def _symmetrize_swap_equivariant(sd):
    """Make a TorchResNetCls state_dict EXACTLY swap-equivariant:
    f(swap(x)) == f(x)[::-1]. Mask-channel swap pi_in = (1 0 2 3 4) maps
    to a feature-channel involution pi_f (swap halves) propagated
    through every layer; averaging each tensor with its permuted image
    enforces w[pi(i), o] == w[i, pi(o)]. This is the structure swap
    augmentation teaches a trained net (supervised_order.py:48,459-463);
    on it the directions=1 knob is lossless by construction."""
    import torch as T

    def pf(n):
        h = n // 2
        return list(range(h, n)) + list(range(h))

    out = {}
    for k, v in sd.items():
        t = v.clone()
        if k == 'conv1.weight':                       # (O, I, kh, kw)
            pin = [1, 0, 2, 3, 4]
            t = (t + t[pf(t.shape[0])][:, pin]) / 2
        elif k.startswith('fc.'):
            if k.endswith('weight'):                  # (2, C)
                t = (t + t[[1, 0]][:, pf(t.shape[1])]) / 2
            else:                                     # (2,)
                t = (t + t[[1, 0]]) / 2
        elif t.dim() == 4:                            # conv (O, I, kh, kw)
            t = (t + t[pf(t.shape[0])][:, pf(t.shape[1])]) / 2
        elif t.dim() == 1:                            # bn / bias (C,)
            t = (t + t[pf(t.shape[0])]) / 2
        out[k] = t
    return out


def test_directions1_delta_vs_ensemble(tmp_path, capsys):
    """Quantify the directions=1 serving knob against the reference-
    parity swap ensemble (VERDICT r2 item 4) on the converted-checkpoint
    fixture: matrix disagreement rate and R/P/F1 delta.

    Two nets are measured: (a) an exactly swap-equivariant net (the
    consistency swap augmentation trains toward) — the knob must be
    LOSSLESS there; (b) an unconstrained random net — the pessimistic
    ceiling, printed as a diagnostic only (random weights have no swap
    consistency; a trained run measured 4.38% disagreement / -0.10 F1,
    tools/measure_directions_delta.py + README 'Serving knobs')."""
    import jax
    from instaorder_tpu.compat.torch_convert import convert_checkpoint
    from instaorder_tpu.models import resnet
    from instaorder_tpu.eval.pipeline import OrderPredictor

    torch.manual_seed(0)
    tm = TorchResNetCls(layers=(1, 1, 1, 1), in_channels=5, num_classes=2)
    with torch.no_grad():
        tm.fc.weight.mul_(4.0)  # polarise away from the threshold
    tm.eval()

    root = str(tmp_path / 'fix')
    os.makedirs(root)
    insta, _, img_dir = make_instaorder_fixture(root)
    reader = R.InstaOrderReader(insta)
    from PIL import Image

    _, _, cfg = resnet.init(jax.random.PRNGKey(0), arch='resnet50',
                            in_channels=5, num_classes=2,
                            layers_override=(1, 1, 1, 1))

    def measure(sd, tag):
        pth = str(tmp_path / f'ckpt_{tag}.pth.tar')
        torch.save({'step': 1, 'state_dict': {
            f'module.{k}': v for k, v in sd.items()}}, pth)
        params, stats, _ = convert_checkpoint(pth, cfg, 'resnet')
        preds = {d: OrderPredictor(resnet.apply, cfg, params, stats,
                                   'InstaOrderNet_o',
                                   patch_or_image='patch',
                                   input_size=64, directions=d)
                 for d in (1, 2)}
        disagree = total = 0
        rpf = {1: [], 2: []}
        for idx in range(reader.get_image_length()):
            modal, cat, bboxes, amodal, fn = reader.get_image_instances(
                idx, with_gt=True)[:5]
            image = np.array(Image.open(os.path.join(img_dir, fn))
                             .convert('RGB')).astype(np.float32)
            ebb = expand_bbox(bboxes, 3.0).astype(np.float32)
            gt = reader.get_gt_ordering(idx, 'occlusion', 0)
            mats = {}
            for d, pred in preds.items():
                mats[d] = pred.infer_occ_order(
                    image, modal.astype(np.float32), ebb)
                rpf[d].append(
                    eval_order_recall_precision_f1(mats[d], gt, 0))
            n = modal.shape[0]
            off = ~np.eye(n, dtype=bool)
            disagree += int((mats[1][off] != mats[2][off]).sum())
            total += int(off.sum())
        rate = disagree / max(total, 1)
        m1 = np.mean(np.array(rpf[1]), axis=0)
        m2 = np.mean(np.array(rpf[2]), axis=0)
        print(f'[directions delta/{tag}] '
              f'disagreement={100 * rate:.2f}% ({disagree}/{total}); '
              f'd2 F1={m2[2]:.2f} d1 F1={m1[2]:.2f} '
              f'dF1={m1[2] - m2[2]:+.2f}')
        return rate, m1, m2

    # (a) swap-equivariant: the knob is lossless by construction.
    # Push the (class-symmetric) fc bias up so the net actually makes
    # positive predictions — a constant added to both logits preserves
    # the equivariance, so agreement is tested on non-trivial matrices.
    sd_eq = _symmetrize_swap_equivariant(tm.state_dict())
    sd_eq['fc.bias'] = sd_eq['fc.bias'] + 1.0
    rate, m1, m2 = measure(sd_eq, 'equivariant')
    assert m1[2] > 0, 'equivariant net must predict some positives'
    assert rate <= 0.02, rate
    np.testing.assert_allclose(m1, m2, atol=1e-6)

    # (b) unconstrained random net: diagnostic only (no swap
    # consistency -> arbitrary disagreement is EXPECTED)
    measure(tm.state_dict(), 'random')
