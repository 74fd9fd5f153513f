"""PCNet-M order inference & amodal completion.

Parity targets (reference inference.py):
  net_forward (softmax > th decode)        <- :22-41
  infer_order (erase-and-complete votes)   <- :627-688
  get_neighbors / get_ancestors            <- :805-822
  infer_amodal / infer_amodal_sup          <- :860-926
  infer_amodal_hull                        <- :239-251
  recover_mask / resize_mask / patch_to_fullimage <- :217-236, 929-933

The reference runs one host round trip per (pair|instance); here every
batch of patches goes through ONE jitted forward. The graph walks
(ancestors) stay on host — they're data-dependent control flow over tiny
matrices.
"""

from __future__ import annotations


import cv2
import numpy as np
import jax
import jax.numpy as jnp

from ..utils.geometry import crop_padding


def resize_mask(mask, size, interp):
    if interp == 'linear':
        return (cv2.resize(mask.astype(np.float32), (size, size),
                           interpolation=cv2.INTER_LINEAR) > 0.5
                ).astype(np.uint8)
    return cv2.resize(mask, (size, size), interpolation=cv2.INTER_NEAREST)


def recover_mask(mask, bbox, h, w, interp):
    size = bbox[2]
    if interp == 'linear':
        m = (cv2.resize(mask.astype(np.float32), (size, size),
                        interpolation=cv2.INTER_LINEAR) > 0.5
             ).astype(np.uint8)
    else:
        m = cv2.resize(mask, (size, size), interpolation=cv2.INTER_NEAREST)
    return crop_padding(m, [-bbox[0], -bbox[1], w, h], pad_value=(0,))


def patch_to_fullimage(patches, bboxes, height, width, interp):
    return np.array([recover_mask(p, b, height, width, interp)
                     for p, b in zip(patches, bboxes)])


def get_neighbors(graph, idx):
    return np.where(graph[idx, :] != 0)[0]


def get_ancestors(graph, idx):
    """BFS over `graph[q, :] == -1` edges (cycle-safe),
    reference inference.py:809-822."""
    is_anc = np.zeros(graph.shape[0], bool)
    visited = np.zeros(graph.shape[0], bool)
    queue = {idx}
    while queue:
        q = queue.pop()
        if visited[q]:
            continue
        visited[q] = True
        new_anc = np.where(graph[q, :] == -1)[0]
        is_anc[new_anc] = True
        queue.update(new_anc.tolist())
    is_anc[idx] = False
    return np.where(is_anc)[0]


class AmodalCompleter:
    """Batched PCNet-M driver.

    apply_fn(params, stats, cfg, x, rgb=?, train=False) -> (logits NHWC,
    stats). Patches are (B, sz, sz, 2): [modal*category, eraser]."""

    def __init__(self, apply_fn, cfg, params, stats, use_rgb=False,
                 input_size=256):
        self.cfg = cfg
        self.params = params
        self.stats = stats
        self.use_rgb = use_rgb
        self.input_size = input_size

        @jax.jit
        def _forward(params, stats, x, rgb):
            kw = {'rgb': rgb} if use_rgb else {}
            out, _ = apply_fn(params, stats, cfg, x, train=False, **kw)
            return jax.nn.softmax(out, axis=-1)[..., 1]

        self._forward = _forward

    def _predict_prob(self, modal_patches, eraser_patches, rgb_patches):
        """Batch of host patches -> (B, sz, sz) P(class=1) array."""
        x = np.stack([np.stack([m, e], -1) for m, e in
                      zip(modal_patches, eraser_patches)]).astype(np.float32)
        rgb = (np.stack(rgb_patches).astype(np.float32)
               if self.use_rgb else np.zeros((len(modal_patches), 1, 1, 3),
                                             np.float32))
        return np.asarray(self._forward(self.params, self.stats,
                                        jnp.asarray(x), jnp.asarray(rgb)))

    def _predict(self, modal_patches, eraser_patches, rgb_patches, th):
        """Batch of host patches -> list of uint8 amodal patches."""
        prob = self._predict_prob(modal_patches, eraser_patches, rgb_patches)
        return (prob > th).astype(np.uint8)

    def infer_order(self, image, inmodal, category, bboxes, pairs='all',
                    th=0.5, dilate_kernel=0, input_size=None,
                    min_input_size=32, interp='nearest'):
        """Erase-and-complete occlusion voting (inference.py:627-688):
        for each ordered pair (t, e), erase e's mask from t's patch,
        complete, count newly-explained pixels under the eraser (scaled by
        resize ratio^2); the larger vote wins the pair."""
        num = inmodal.shape[0]
        order = np.zeros((num, num), int)
        from ..ops.morphology import bordering_matrix
        if pairs == 'nbor':
            border = np.asarray(bordering_matrix(jnp.asarray(inmodal)))
        ind = []
        for i in range(num):
            for j in range(i + 1, num):
                if pairs == 'nbor' and not border[i, j]:
                    continue
                ind.append([i, j])
                ind.append([j, i])
        if not ind:
            return order
        modal_ps, eraser_ps, rgb_ps, ratios = [], [], [], []
        for tid, eid in ind:
            patch = crop_padding(inmodal[tid], bboxes[tid], pad_value=(0,))
            newsize = (input_size if input_size is not None else
                       (min_input_size if min_input_size > bboxes[tid][2]
                        else None))
            if newsize is not None:
                patch = resize_mask(patch, newsize, interp)
            eraser = crop_padding(inmodal[eid], bboxes[tid], pad_value=(0,))
            if newsize is not None:
                eraser = resize_mask(eraser, newsize, interp)
            if dilate_kernel > 0:
                eraser = cv2.dilate(
                    eraser, np.ones((dilate_kernel, dilate_kernel),
                                    np.uint8), iterations=1)
            patch = patch.copy()
            patch[eraser == 1] = 0
            modal_ps.append(patch * category[tid])
            eraser_ps.append(eraser)
            if self.use_rgb:
                rp = crop_padding(image, bboxes[tid], pad_value=(0, 0, 0))
                sz = patch.shape[0]
                rp = cv2.resize(rp, (sz, sz),
                                interpolation=cv2.INTER_CUBIC)
                rgb_ps.append(rp.transpose(0, 1, 2))
            ratios.append(1.0 if newsize is None
                          else bboxes[tid][2] / float(newsize))
        amodal_ps = self._predict(modal_ps, eraser_ps, rgb_ps, th)
        occ_value = np.zeros((num, num), np.float32)
        for k, (t, e) in enumerate(ind):
            occ_value[t, e] = (((amodal_ps[k] > modal_ps[k])
                                & (eraser_ps[k] == 1)).sum()
                               * ratios[k] ** 2)
        order[occ_value > occ_value.T] = 0
        order[occ_value < occ_value.T] = 1
        order[(occ_value == 0) & (occ_value == 0).T] = 0
        return order

    def infer_amodal(self, image, inmodal, category, bboxes, order_matrix,
                     th=0.5, dilate_kernel=0, input_size=None,
                     min_input_size=16, interp='nearest',
                     order_grounded=True):
        """Ancestor-union erase + complete per instance
        (inference.py:885-926)."""
        num = inmodal.shape[0]
        modal_ps, eraser_ps, rgb_ps = [], [], []
        for i in range(num):
            anc = (get_ancestors(order_matrix, i) if order_grounded
                   else get_neighbors(order_matrix, i))
            patch = crop_padding(inmodal[i], bboxes[i], pad_value=(0,))
            newsize = (input_size if input_size is not None else
                       (min_input_size if min_input_size > bboxes[i][2]
                        else None))
            if newsize is not None:
                patch = resize_mask(patch, newsize, interp)
            eraser = (inmodal[anc, ...].sum(axis=0) > 0).astype(np.uint8)
            eraser = crop_padding(eraser, bboxes[i], pad_value=(0,))
            if newsize is not None:
                eraser = resize_mask(eraser, newsize, interp)
            if dilate_kernel > 0:
                eraser = cv2.dilate(
                    eraser, np.ones((dilate_kernel, dilate_kernel),
                                    np.uint8), iterations=1)
            patch = patch.copy()
            patch[eraser == 1] = 0
            modal_ps.append(patch * category[i])
            eraser_ps.append(eraser)
            if self.use_rgb:
                rp = crop_padding(image, bboxes[i], pad_value=(0, 0, 0))
                sz = patch.shape[0]
                rgb_ps.append(cv2.resize(rp, (sz, sz),
                                         interpolation=cv2.INTER_CUBIC))
        return list(self._predict(modal_ps, eraser_ps, rgb_ps, th))


def infer_amodal_hull(inmodal, bboxes, order_matrix, order_grounded=True):
    """Convex-hull amodal baseline (inference.py:239-251)."""
    from .heuristics import convex_hull_image
    out = []
    for i in range(inmodal.shape[0]):
        m = inmodal[i]
        hull = convex_hull_image(m).astype(np.uint8)
        if order_grounded:
            assert order_matrix is not None
            anc = get_ancestors(order_matrix, i)
            eraser = (inmodal[anc, ...].sum(axis=0) > 0).astype(np.uint8)
            hull[(eraser == 0) & (m == 0)] = 0
        out.append(hull)
    return out


def infer_instseg(completer, image, category, bboxes, new_bboxes,
                  input_size, th, rgb=None):
    """Instance segmentation from bbox prompts (inference.py:825-857):
    bbox mask -> PCNet forward (no eraser channel is zero here) ->
    softmax threshold; with `rgb` given, denseCRF mean-field refinement
    of the softmax before thresholding (inference.py:849-853 via
    utils/common_utils.py:169-177 — reimplemented in ops/crf.py, no
    pydensecrf dependency)."""
    import cv2 as _cv2
    num = bboxes.shape[0]
    modal_ps, eraser_ps, rgb_ps = [], [], []
    for i in range(num):
        rel = [bboxes[i][0] - new_bboxes[i][0],
               bboxes[i][1] - new_bboxes[i][1], bboxes[i][2], bboxes[i][3]]
        bbox_mask = np.zeros((new_bboxes[i][3], new_bboxes[i][2]), np.uint8)
        bbox_mask[rel[1]:rel[1] + rel[3], rel[0]:rel[0] + rel[2]] = 1
        bbox_mask = _cv2.resize(bbox_mask, (input_size, input_size),
                                interpolation=_cv2.INTER_NEAREST)
        modal_ps.append(bbox_mask.astype(np.float32) * category[i])
        eraser_ps.append(np.zeros_like(bbox_mask, np.float32))
        if completer.use_rgb:
            rp = crop_padding(image, new_bboxes[i], pad_value=(0, 0, 0))
            rgb_ps.append(_cv2.resize(rp, (input_size, input_size),
                                      interpolation=_cv2.INTER_CUBIC))
    if rgb is None:
        return list(completer._predict(modal_ps, eraser_ps, rgb_ps, th))
    from ..ops.crf import densecrf
    probs = completer._predict_prob(modal_ps, eraser_ps, rgb_ps)
    out = []
    for i in range(num):
        rgb_patch = _cv2.resize(
            crop_padding(rgb, new_bboxes[i], pad_value=(0, 0, 0)),
            (input_size, input_size), interpolation=_cv2.INTER_CUBIC)
        prob = np.stack([1.0 - probs[i], probs[i]])
        prob_crf = densecrf(prob, rgb_patch)
        out.append((prob_crf[1] > th).astype(np.uint8))
    return out
