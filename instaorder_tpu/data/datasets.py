"""Training datasets (host-side sampling -> fixed-shape numpy samples).

Parity targets:
  SupOcclusionOrderDataset  <- datasets/occ_order_dataset.py
  SupDepthOrderDataset      <- datasets/depth_order_dataset.py
  SupDepthOccOrderDataset   <- datasets/depth_occ_order_dataset.py
  PartialCompDataset        <- datasets/partial_comp_dataset.py

Each `sample(idx, rng)` returns a dict in the algos.py batch convention
(NHWC rgb, (H, W) float masks, label fields). Randomness flows through an
explicit numpy RNG so the stream is reproducible and worker-shardable.
Crop/resize/flip use cv2 on host exactly like the reference (the fused
on-device path in ops/pairs.py is the eval/serving analogue).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image

from . import readers as R
from .. import utils as G
from ..utils.geometry import pair_crop_bbox

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _normalize(rgb_uint8):
    x = rgb_uint8.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def _make_reader(config, phase):
    dataset = config['dataset']
    annot = config[f'{phase}_annot_file']
    if dataset == 'COCOA':
        return R.COCOAReader(annot)
    if dataset == 'InstaOrder':
        return R.InstaOrderReader(annot)
    if dataset == 'Mapillary':
        return R.MapillaryReader(config[f'{phase}_root'], annot)
    return R.KINSLVISReader(dataset, annot)


class _PairDatasetBase:
    """Shared crop modes (patch/image/resize) + image loading."""

    def __init__(self, config, phase):
        self.config = config
        self.phase = phase
        self.sz = config['input_size']
        self.data_reader = _make_reader(config, phase)
        self.mode = config['patch_or_image']
        assert self.mode in ('patch', 'image', 'resize')

    def _load_image(self, fn):
        root = self.config[f'{self.phase}_image_root']
        return np.array(Image.open(os.path.join(root, fn)).convert('RGB'))

    def _flip(self, rng, *arrays):
        if self.config['base_aug']['flip'] and rng.rand() > 0.5:
            return tuple(a[:, ::-1].copy() for a in arrays)
        return arrays

    def _get_pair(self, modal, bboxes, idx1, idx2, imgfn, rng,
                  load_rgb=True, randshift=False):
        """patch mode: union-bbox square crop + train shift/scale aug
        (occ_order_dataset.py:138-180)."""
        shift = self.config['base_aug']['shift'] if (
            self.phase == 'train' and randshift) else None
        scale = self.config['base_aug']['scale'] if (
            self.phase == 'train') else None
        roi = pair_crop_bbox(bboxes[idx1], bboxes[idx2], shift, scale, rng)
        m1 = cv2.resize(G.crop_padding(modal[idx1], roi, (0,)),
                        (self.sz, self.sz), interpolation=cv2.INTER_NEAREST)
        m2 = cv2.resize(G.crop_padding(modal[idx2], roi, (0,)),
                        (self.sz, self.sz), interpolation=cv2.INTER_NEAREST)
        rgb = None
        if load_rgb:
            img = self._load_image(imgfn)
            rgb = cv2.resize(G.crop_padding(img, roi, (0, 0, 0)),
                             (self.sz, self.sz),
                             interpolation=cv2.INTER_CUBIC)
        if rgb is None:
            m1, m2 = self._flip(rng, m1, m2)
            return m1, m2, None
        m1, m2, rgb = self._flip(rng, m1, m2, rgb)
        return m1, m2, _normalize(rgb)

    def _get_pair_image(self, modal, bboxes, idx1, idx2, imgfn, rng,
                        load_rgb=True, randshift=False):
        """image mode: pad-to-square + resize (occ_order_dataset.py:
        99-136)."""
        _, hh, ww = modal.shape
        side = int(max(hh, ww))
        left, top = (side - ww) // 2, (side - hh) // 2

        def pad(m):
            out = np.zeros((side, side), m.dtype)
            out[top:top + hh, left:left + ww] = m
            return out

        m1 = cv2.resize(pad(modal[idx1]), (self.sz, self.sz),
                        interpolation=cv2.INTER_NEAREST)
        m2 = cv2.resize(pad(modal[idx2]), (self.sz, self.sz),
                        interpolation=cv2.INTER_NEAREST)
        rgb = None
        if load_rgb:
            img = self._load_image(imgfn)
            padded = np.zeros((side, side, 3), img.dtype)
            padded[top:top + hh, left:left + ww] = img
            rgb = cv2.resize(padded, (self.sz, self.sz),
                             interpolation=cv2.INTER_LINEAR)
        if rgb is None:
            m1, m2 = self._flip(rng, m1, m2)
            return m1, m2, None
        m1, m2, rgb = self._flip(rng, m1, m2, rgb)
        return m1, m2, _normalize(rgb)

    def _get_pair_resize(self, modal, bboxes, idx1, idx2, imgfn, rng,
                         load_rgb=True, randshift=False):
        """resize mode: full-image resize (occ_order_dataset.py:81-97)."""
        m1 = cv2.resize(modal[idx1], (self.sz, self.sz),
                        interpolation=cv2.INTER_NEAREST)
        m2 = cv2.resize(modal[idx2], (self.sz, self.sz),
                        interpolation=cv2.INTER_NEAREST)
        rgb = None
        if load_rgb:
            img = self._load_image(imgfn)
            rgb = cv2.resize(img, (self.sz, self.sz),
                             interpolation=cv2.INTER_LINEAR)
        if rgb is None:
            m1, m2 = self._flip(rng, m1, m2)
            return m1, m2, None
        m1, m2, rgb = self._flip(rng, m1, m2, rgb)
        return m1, m2, _normalize(rgb)

    def _pair_fn(self):
        return {'patch': self._get_pair, 'image': self._get_pair_image,
                'resize': self._get_pair_resize}[self.mode]

    def _zero_rgb(self):
        return np.zeros((self.sz, self.sz, 3), np.float32)


class SupOcclusionOrderDataset(_PairDatasetBase):
    """Per-image occluded/non-pair sampling; emits OrderNet 1-of-{3,4}
    labels or InstaOrderNet_o 2-bit vectors."""

    def __init__(self, config, phase, algo):
        super().__init__(config, phase)
        self.algo = algo
        self.rm_bidirec = config['remove_occ_bidirec']
        self.dataset = config['dataset']

    def __len__(self):
        return self.data_reader.get_image_length()

    def _gt_matrix(self, idx):
        # NB use_category multiplies BEFORE the KINS gt derivation, as the
        # reference does (occ_order_dataset.py:183-188) — with category ids
        # > 1 this zeroes infer_gt_order's `== 1` tests, a reference quirk
        # kept for parity (shipped configs all use use_category: False).
        if self.dataset == 'KINS':
            from ..eval.heuristics import infer_gt_order
            modal, category, bboxes, amodal, fn = \
                self.data_reader.get_image_instances(idx, with_gt=True)
            if self.config.get('use_category', False):
                modal = modal * category[:, None, None]
            gt = infer_gt_order(modal, amodal)
            return modal, bboxes, fn, gt
        if self.dataset == 'InstaOrder':
            modal, category, bboxes, _, fn = \
                self.data_reader.get_image_instances(idx, with_gt=True)
            gt = self.data_reader.get_gt_ordering(
                idx, type='occlusion', rm_bidirec=self.rm_bidirec)
        else:
            modal, category, bboxes, _, fn = \
                self.data_reader.get_image_instances(idx, with_gt=True)
            gt = self.data_reader.get_gt_ordering(idx)
        if self.config.get('use_category', False):
            modal = modal * category[:, None, None]
        return modal, bboxes, fn, gt

    def _pair_ind(self, idx, rng):
        modal, bboxes, fn, gt = self._gt_matrix(idx)
        np.fill_diagonal(gt, -1)
        pairs = np.where(gt == 1)
        non_pairs = np.where(gt == 0)
        if len(pairs[0]) == 0:
            return self._pair_ind(rng.choice(len(self)), rng)
        return modal, bboxes, fn, pairs, non_pairs, gt

    def sample(self, idx, rng):
        modal, bboxes, fn, pairs, non_pairs, gt = self._pair_ind(idx, rng)
        get_pair = self._pair_fn()
        load_rgb = self.config['load_rgb']

        if self.algo == 'OrderNet':
            # labels: 0 B-over-A / 1 A-over-B / 2 none / 3 bidirec
            if rng.rand() < 0.7 or len(non_pairs[0]) == 0:
                k = rng.choice(len(pairs[0]))
                idx1, idx2 = pairs[0][k], pairs[1][k]
                label = 1
                if self.config['extend_bidirec'] and gt[idx2, idx1]:
                    label = 3
            else:
                k = rng.choice(len(non_pairs[0]))
                idx1, idx2 = non_pairs[0][k], non_pairs[1][k]
                label = 2
            m1, m2, rgb = get_pair(modal, bboxes, idx1, idx2, fn, rng,
                                   load_rgb=load_rgb, randshift=True)
            rgb = rgb if rgb is not None else self._zero_rgb()
            if rng.rand() < 0.5:
                return {'rgb': rgb, 'modal1': m1.astype(np.float32),
                        'modal2': m2.astype(np.float32), 'label': label}
            return {'rgb': rgb, 'modal1': m2.astype(np.float32),
                    'modal2': m1.astype(np.float32),
                    'label': 0 if label == 1 else label}

        assert self.algo == 'InstaOrderNet_o', self.algo
        if rng.rand() < 0.7 or len(non_pairs[0]) == 0:
            k = rng.choice(len(pairs[0]))
            idx1, idx2 = pairs[0][k], pairs[1][k]
        else:
            k = rng.choice(len(non_pairs[0]))
            idx1, idx2 = non_pairs[0][k], non_pairs[1][k]
        m1, m2, rgb = get_pair(modal, bboxes, idx1, idx2, fn, rng,
                               load_rgb=load_rgb, randshift=True)
        rgb = rgb if rgb is not None else self._zero_rgb()
        a_over_b = gt[idx1, idx2]
        b_over_a = gt[idx2, idx1]
        if rng.rand() < 0.5:
            occ = np.array([b_over_a, a_over_b], np.float32)
            return {'rgb': rgb, 'modal1': m1.astype(np.float32),
                    'modal2': m2.astype(np.float32), 'occ_order': occ}
        occ = np.array([a_over_b, b_over_a], np.float32)
        return {'rgb': rgb, 'modal1': m2.astype(np.float32),
                'modal2': m1.astype(np.float32), 'occ_order': occ}


class _DepthPairBase(_PairDatasetBase):
    def __init__(self, config, phase):
        super().__init__(config, phase)
        self.rm_overlap = config.get('remove_depth_overlap', 0)
        self.length = self.data_reader.get_geometric_length()

    def __len__(self):
        return self.length

    def _depth_label(self, gt_depth, idx1, idx2):
        if gt_depth[idx1, idx2] == -1:
            return -1
        if gt_depth[idx1, idx2] == 1 and gt_depth[idx2, idx1] == 0:
            return 0
        if gt_depth[idx1, idx2] == 2:
            return 2
        raise ValueError('inconsistent depth matrix entry')


class SupDepthOrderDataset(_DepthPairBase):
    """Iterates the depth *pair* list (not images), depth_order_dataset.py."""

    def __init__(self, config, phase, algo):
        super().__init__(config, phase)
        self.algo = algo

    def sample(self, idx, rng):
        img_id, g_order = self.data_reader.get_imgId_and_depth(idx)
        modal, category, bboxes, _, fn = \
            self.data_reader.get_image_instances(img_id, with_gt=True)
        if self.config.get('use_category', False):
            modal = modal * category[:, None, None]
        gt_depth, gt_overlap, gt_count = self.data_reader.get_gt_ordering(
            img_id, type='depth', rm_overlap=self.rm_overlap)
        if gt_depth.sum() == -gt_depth.size:
            return self.sample(rng.choice(len(self)), rng)
        sep = '<' if '<' in g_order else '='
        idx1, idx2 = map(int, g_order.split(sep))
        m1, m2, rgb = self._pair_fn()(modal, bboxes, idx1, idx2, fn, rng,
                                      load_rgb=self.config['load_rgb'],
                                      randshift=True)
        rgb = rgb if rgb is not None else self._zero_rgb()
        label = self._depth_label(gt_depth, idx1, idx2)
        count = gt_count[idx1, idx2]
        is_overlap = gt_overlap[idx1, idx2]
        if rng.rand() < 0.5:
            return {'rgb': rgb, 'modal1': m1.astype(np.float32),
                    'modal2': m2.astype(np.float32), 'depth_order': label,
                    'count': count, 'is_overlap': is_overlap}
        return {'rgb': rgb, 'modal1': m2.astype(np.float32),
                'modal2': m1.astype(np.float32),
                'depth_order': 1 if label == 0 else label,
                'count': count, 'is_overlap': is_overlap}


class SupDepthOccOrderDataset(_DepthPairBase):
    """Joint depth + occlusion labels for the same pair,
    depth_occ_order_dataset.py."""

    def __init__(self, config, phase, algo):
        super().__init__(config, phase)
        self.algo = algo
        self.rm_bidirec = config['remove_occ_bidirec']

    def sample(self, idx, rng):
        img_id, g_order = self.data_reader.get_imgId_and_depth(idx)
        modal, category, bboxes, _, fn = \
            self.data_reader.get_image_instances(img_id, with_gt=True)
        gt_depth, gt_overlap, gt_count = self.data_reader.get_gt_ordering(
            img_id, type='depth', rm_overlap=self.rm_overlap)
        gt_occ = self.data_reader.get_gt_ordering(
            img_id, type='occlusion', rm_bidirec=self.rm_bidirec)
        sep = '<' if '<' in g_order else '='
        idx1, idx2 = map(int, g_order.split(sep))
        m1, m2, rgb = self._pair_fn()(modal, bboxes, idx1, idx2, fn, rng,
                                      load_rgb=self.config['load_rgb'],
                                      randshift=True)
        rgb = rgb if rgb is not None else self._zero_rgb()
        depth_label = self._depth_label(gt_depth, idx1, idx2)
        count = gt_count[idx1, idx2]
        is_overlap = gt_overlap[idx1, idx2]
        a_over_b = gt_occ[idx1, idx2]
        b_over_a = gt_occ[idx2, idx1]
        if rng.rand() < 0.5:
            return {'rgb': rgb, 'modal1': m1.astype(np.float32),
                    'modal2': m2.astype(np.float32),
                    'depth_order': depth_label, 'count': count,
                    'is_overlap': is_overlap,
                    'occ_order': np.array([b_over_a, a_over_b], np.float32)}
        return {'rgb': rgb, 'modal1': m2.astype(np.float32),
                'modal2': m1.astype(np.float32),
                'depth_order': 1 if depth_label == 0 else depth_label,
                'count': count, 'is_overlap': is_overlap,
                'occ_order': np.array([a_over_b, b_over_a], np.float32)}


class PartialCompDataset(_PairDatasetBase):
    """PCNet-M self-supervised erasing (partial_comp_dataset.py)."""

    def __init__(self, config, phase, algo=None):
        super().__init__(config, phase)
        self.eraser_setter = G.EraserSetter(config['eraser_setter'])
        self.eraser_front_prob = config['eraser_front_prob']
        self.data_reader.get_instance_length()  # builds indexing

    def __len__(self):
        return self.data_reader.get_instance_length()

    def _get_inst(self, idx, rng, load_rgb=False, randshift=False):
        modal, bbox, category, imgfn, _ = self.data_reader.get_instance(idx)
        cx = bbox[0] + bbox[2] / 2.0
        cy = bbox[1] + bbox[3] / 2.0
        size = max(np.sqrt(bbox[2] * bbox[3] * self.config['enlarge_box']),
                   bbox[2] * 1.1, bbox[3] * 1.1)
        if size < 5 or np.all(modal == 0):
            return self._get_inst(rng.choice(len(self)), rng,
                                  load_rgb=load_rgb, randshift=randshift)
        if self.phase == 'train':
            if randshift:
                cx += rng.uniform(*self.config['base_aug']['shift']) * size
                cy += rng.uniform(*self.config['base_aug']['shift']) * size
            size /= rng.uniform(*self.config['base_aug']['scale'])
        roi = [int(cx - size / 2.0), int(cy - size / 2.0), int(size),
               int(size)]
        modal = cv2.resize(G.crop_padding(modal, roi, (0,)),
                           (self.sz, self.sz),
                           interpolation=cv2.INTER_NEAREST)
        flip = self.config['base_aug']['flip'] and rng.rand() > 0.5
        if flip:
            modal = modal[:, ::-1].copy()
        rgb = None
        if load_rgb:
            img = self._load_image(imgfn)
            rgb = cv2.resize(G.crop_padding(img, roi, (0, 0, 0)),
                             (self.sz, self.sz),
                             interpolation=cv2.INTER_CUBIC)
            if flip:
                rgb = rgb[:, ::-1].copy()
            rgb = _normalize(rgb)
        return modal, category, rgb

    def sample(self, idx, rng):
        randidx = rng.choice(len(self))
        modal, category, rgb = self._get_inst(
            idx, rng, load_rgb=self.config['load_rgb'], randshift=True)
        if not self.config.get('use_category', True):
            category = 1
        eraser, _, _ = self._get_inst(randidx, rng, load_rgb=False,
                                      randshift=False)
        eraser = self.eraser_setter(modal, eraser, rng)
        erased_modal = modal.astype(np.float32).copy()
        if rng.rand() < self.eraser_front_prob:
            erased_modal[eraser == 1] = 0
        else:
            eraser = eraser.copy()
            eraser[modal == 1] = 0
        erased_modal = erased_modal * category
        max_shrink = self.config.get('max_eraser_shrink', 0)
        if max_shrink > 0:
            shrink = rng.choice(np.arange(max_shrink + 1))
            if shrink > 0:
                k = shrink * 2 + 1
                eraser = 1 - cv2.dilate(
                    (1 - eraser).astype(np.uint8),
                    np.ones((k, k), np.uint8), iterations=1)
        eraser_f = eraser.astype(np.float32)
        if rgb is None:
            rgb = np.zeros((self.sz, self.sz, 3), np.float32)
        else:
            rgb = rgb * (1.0 - eraser_f)[..., None]
        return {'rgb': rgb, 'modal': erased_modal, 'eraser': eraser_f,
                'target': modal.astype(np.int32)}


DATASETS = {
    'SupOcclusionOrderDataset': SupOcclusionOrderDataset,
    'SupDepthOrderDataset': SupDepthOrderDataset,
    'SupDepthOccOrderDataset': SupDepthOccOrderDataset,
    'PartialCompDataset': PartialCompDataset,
}


def collate(samples):
    """Stack a list of sample dicts into a batch dict."""
    keys = samples[0].keys()
    return {k: np.stack([s[k] for s in samples]) for k in keys}
