"""Batched order inference pipeline — one device program per image.

The reference's eval loop (Tester.eval_occ_order, tools/test.py:404-476 +
inference.py:349-624) runs N(N-1)/2 Python iterations per image, each with
cv2 preprocessing and a per-pair H2D->forward->D2H round trip. Here:

  1. host: decode masks once; compute the (padded) pair index list
  2. device, one program: fused pair preprocessing -> both-direction
     siamese forward over the 2P batch -> decode -> (N, N) matrices

Pair counts are padded to the next bucket so a handful of compiled
programs covers the whole dataset (static shapes for XLA).
"""

from __future__ import annotations

import functools
import inspect

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.pairs import (all_pair_indices, build_pair_batch,
                         build_pair_batch_rois,
                         build_pair_batch_shared_rgb)
from ..ops.morphology import bordering_matrix
from . import decode as D

PAIR_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024)

# 'orig' eval mode pads the x32-rounded image to the next multiple of
# this step and tells the net the valid region (resnet.apply valid_hw),
# so real-size eval compiles O(#buckets) programs instead of one per
# image size (reference inference.py:401-408 runs truly per-size).
HW_BUCKET_STEP = 128


def bucket_pairs(p: int) -> int:
    for b in PAIR_BUCKETS:
        if p <= b:
            return b
    return int(np.ceil(p / PAIR_BUCKETS[-1]) * PAIR_BUCKETS[-1])


def bucket_hw(v: int) -> int:
    return max(HW_BUCKET_STEP,
               int(np.ceil(v / HW_BUCKET_STEP) * HW_BUCKET_STEP))


def _swap_input(x):
    """Swap the two mask channels of a (P, H, W, 5) batch."""
    return x[..., jnp.asarray([1, 0, 2, 3, 4])]


class OrderPredictor:
    """Batched equivalent of infer_order_sup_{occ,depth,occ_depth}.

    forward(params, stats, x) must return logits for a (2P, sz, sz, C)
    batch: (P,2)/(P,{3,4}) single head or ((P,2),(P,3)) dual head —
    jit-compiled once per pair bucket.
    """

    def __init__(self, apply_fn, cfg, params, stats, method,
                 patch_or_image='patch', input_size=256, use_rgb=True,
                 mesh=None, directions=2, siamese_fn=None,
                 prep_impl='einsum', prep_passes=3,
                 prep_interpret=False, prep_dtype=None):
        """mesh: optional jax.sharding.Mesh — shards the 2P pair batch
        over the `data` axis so one image's pairs spread across chips
        (the "pair sharding" scale axis, SURVEY.md §5).

        directions: 2 (reference parity — forward both mask orders and
        average the sigmoids/softmaxes, inference.py:196-214) or 1
        (serving speed knob: single forward per pair, ~2x throughput;
        decisions can differ from the reference on threshold-adjacent
        pairs).

        siamese_fn: optional (params, stats, cfg, x) -> (out1, out2)
        computing BOTH swap directions from the un-swapped pair batch
        via the folded-conv1 trick (models/folding.py:95-140) — avoids
        materialising the channel-swapped copy of the (2P, sz, sz, 5)
        batch in HBM at directions=2. Used for the resnet_cls family
        (make_v2_predictor); other model families take the generic
        swapped-concat path.

        prep_impl: 'einsum' (default — cv2-exact cubic matmul prep) or
        'pallas5' (patch mode only): the whole 5-channel pair prep as
        ONE pallas kernel (ops/prep_pallas.fused_prep_pairs — masks
        bit-exact, RGB up to rare 1-LSB uint8 rounding ties; a serving
        knob, not the strict-parity path). prep_passes: 3 = serving
        precision, 1 = the fast bf16 knob. prep_interpret runs the
        kernel in interpret mode (CPU tests). prep_dtype: the fused
        batch's storage dtype — defaults to f32 (any apply_fn accepts
        it); pass jnp.bfloat16 with the quantized/folded serving
        predictors to halve the (2P, sz, sz, 5) HBM tensor."""
        self.apply_fn = apply_fn
        self.cfg = cfg
        self.params = params
        self.stats = stats
        self.method = method
        self.patch_or_image = patch_or_image
        self.input_size = input_size
        self.use_rgb = use_rgb
        self.mesh = mesh
        assert directions in (1, 2)
        self.directions = directions
        assert prep_impl in ('einsum', 'pallas5')
        if prep_impl == 'pallas5' and patch_or_image != 'patch':
            raise ValueError("prep_impl='pallas5' supports patch mode "
                             "only (image/resize/orig share one RGB "
                             "crop across pairs — nothing to fuse)")
        self.prep_impl = prep_impl
        if prep_impl == 'pallas5':
            from ..ops.pairs import build_pair_batches_fused, pair_rois

            @jax.jit
            def _prep5(image, masks, bboxes, pair_idx):
                rois = pair_rois(bboxes, pair_idx)
                return build_pair_batches_fused(
                    image[None], masks[None], pair_idx, rois[None],
                    out_size=input_size,
                    dtype=prep_dtype or jnp.float32,
                    passes=prep_passes, fuse_masks=True,
                    interpret=prep_interpret)

            self._prep5 = _prep5
        # 'orig' bucketing needs the forward to accept a static valid_hw
        # (resnet.apply does); other apply_fns fall back to per-size
        # compiles there
        try:
            self._takes_valid_hw = ('valid_hw' in
                                    inspect.signature(apply_fn).parameters)
        except (TypeError, ValueError):
            self._takes_valid_hw = False

        def _call_apply(params, stats, x, valid_hw):
            if valid_hw is not None:
                out, _ = apply_fn(params, stats, cfg, x, train=False,
                                  valid_hw=valid_hw)
            else:
                out, _ = apply_fn(params, stats, cfg, x, train=False)
            return out

        # valid_hw rides as DYNAMIC int32 scalars (not static args):
        # one compiled program serves every valid size within a bucket
        if mesh is None:
            @jax.jit
            def _forward(params, stats, x, valid_hw=None):
                return _call_apply(params, stats, x, valid_hw)
        else:
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            @jax.jit
            def _forward(params, stats, x, valid_hw=None):
                def _fwd(params, stats, x):
                    return _call_apply(params, stats, x, valid_hw)
                return shard_map(
                    _fwd, mesh=mesh,
                    in_specs=(P(), P(), P('data')),
                    out_specs=P('data'), check_vma=False)(params, stats, x)

        self._forward = _forward

        self._forward_sia = None
        if siamese_fn is not None:
            if mesh is None:
                @jax.jit
                def _forward_sia(params, stats, x):
                    return siamese_fn(params, stats, cfg, x)
            else:
                from jax import shard_map
                from jax.sharding import PartitionSpec as P

                @jax.jit
                def _forward_sia(params, stats, x):
                    def _fwd(params, stats, x):
                        return siamese_fn(params, stats, cfg, x)
                    return shard_map(
                        _fwd, mesh=mesh,
                        in_specs=(P(), P(), P('data')),
                        out_specs=P('data'), check_vma=False)(
                        params, stats, x)
            self._forward_sia = _forward_sia

    def _build_batch(self, image, masks, bboxes, pair_idx):
        """-> (x, valid_hw): the (P, h, w, 5) pair batch plus the static
        valid region for 'orig' bucket padding (None elsewhere)."""
        if self.patch_or_image == 'patch':
            if self.prep_impl == 'pallas5':
                return self._prep5(image, masks, bboxes, pair_idx), None
            return build_pair_batch(image, masks, bboxes, pair_idx,
                                    out_size=self.input_size,
                                    rgb_method='cubic'), None
        if self.patch_or_image == 'image':
            # pad-to-square: one shared roi centred on the image
            # (inference.py:377-393)
            h, w = image.shape[:2]
            side = max(h, w)
            roi = np.array([-((side - w) // 2), -((side - h) // 2),
                            side, side], np.float32)
            rois = jnp.asarray(np.tile(roi, (pair_idx.shape[0], 1)))
            return build_pair_batch_rois(image, masks, pair_idx, rois,
                                         out_size=self.input_size,
                                         rgb_method='linear'), None
        if self.patch_or_image == 'resize':
            return build_pair_batch_shared_rgb(image, masks, pair_idx,
                                               out_size=self.input_size,
                                               rgb_method='cubic'), None
        if self.patch_or_image == 'orig':
            # image-native resolution rounded to x32
            # (inference.py:401-408 via get_closest_int_multiple_of),
            # zero-padded up to the (h, w) bucket with the valid region
            # passed as a static argument — O(#buckets) compiled
            # programs over a real varied-size dataset instead of one
            # per image size. Falls back to exact-size (per-size
            # compiles) when the forward has no valid_hw support.
            from ..utils.geometry import get_closest_int_multiple_of
            h = get_closest_int_multiple_of(int(image.shape[0]), 32)
            w = get_closest_int_multiple_of(int(image.shape[1]), 32)
            # reuse shared-rgb path with a rectangular target
            from ..ops.resize import resize, resize_nearest
            import jax.numpy as jnp_
            rgb = resize(image.astype(np.float32).transpose(2, 0, 1), h, w,
                         'cubic').transpose(1, 2, 0)
            rgb = jnp_.clip(jnp_.round(rgb), 0.0, 255.0)
            from ..ops.pairs import IMAGENET_MEAN, IMAGENET_STD
            rgb = (rgb / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
            masks_r = resize_nearest(jnp_.asarray(masks, jnp_.float32), h, w)
            mi = masks_r[pair_idx[:, 0]]
            mj = masks_r[pair_idx[:, 1]]
            P = pair_idx.shape[0]
            rgb_b = jnp_.broadcast_to(rgb[None], (P, h, w, 3))
            x = jnp_.concatenate([mi[..., None], mj[..., None], rgb_b],
                                 axis=-1)
            if not self._takes_valid_hw:
                return x, None
            hb, wb = bucket_hw(h), bucket_hw(w)
            if (hb, wb) != (h, w):
                x = jnp_.pad(x, ((0, 0), (0, hb - h), (0, wb - w),
                                 (0, 0)))
            return x, (jnp_.int32(h), jnp_.int32(w))
        raise ValueError(self.patch_or_image)

    def _pair_outputs(self, image, masks, bboxes, pairs='all'):
        n = masks.shape[0]
        p = n * (n - 1) // 2
        pair_idx, valid = all_pair_indices(n, bucket_pairs(max(p, 1)))
        if pairs == 'nbor' and n > 1:
            bm = np.asarray(bordering_matrix(jnp.asarray(masks)))
            valid &= bm[pair_idx[:, 0], pair_idx[:, 1]]
        x1, valid_hw = self._build_batch(jnp.asarray(image, jnp.float32),
                                         jnp.asarray(masks), jnp.asarray(
                                             np.asarray(bboxes,
                                                        np.float32)),
                                         jnp.asarray(pair_idx))
        if (self.directions == 2 and self._forward_sia is not None
                and valid_hw is None and self.use_rgb):
            # folded-conv1 siamese: both directions from the un-swapped
            # batch, no channel-swapped HBM copy
            out1, out2 = self._forward_sia(self.params, self.stats, x1)
            return pair_idx, jnp.asarray(valid), out1, out2, n
        if self.directions == 1:
            x = x1
        else:
            x = jnp.concatenate([x1, _swap_input(x1)], axis=0)
        if not self.use_rgb:
            x = x[..., :2]
        out = self._forward(self.params, self.stats, x,
                            valid_hw=valid_hw)
        if self.directions == 1:
            return pair_idx, jnp.asarray(valid), out, None, n
        P = pair_idx.shape[0]
        if isinstance(out, tuple):
            out1 = tuple(o[:P] for o in out)
            out2 = tuple(o[P:] for o in out)
        else:
            out1, out2 = out[:P], out[P:]
        return pair_idx, jnp.asarray(valid), out1, out2, n

    def infer_occ_order(self, image, masks, bboxes, pairs='all'):
        """-> (N, N) int occlusion matrix (inference.py:439-512)."""
        pair_idx, valid, out1, out2, n = self._pair_outputs(
            image, masks, bboxes, pairs)
        if self.method == 'OrderNet':
            i_over_j, j_over_i = D.decode_ordernet(out1, out2)
        elif self.method == 'InstaOrderNet_o':
            i_over_j, j_over_i = D.decode_occ(out1, out2)
        elif self.method in ('InstaOrderNet_od', 'InstaDepthNet_od'):
            occ1 = out1[0] if isinstance(out1, tuple) else out1
            occ2 = (out2[0] if isinstance(out2, tuple) else out2)
            i_over_j, j_over_i = D.decode_occ(occ1, occ2)
        else:
            raise ValueError(self.method)
        return np.asarray(D.occ_matrix(n, jnp.asarray(pair_idx), i_over_j,
                                       j_over_i, valid))

    def infer_depth_order(self, image, masks, bboxes, pairs='all'):
        """-> (N, N) int depth matrix (inference.py:515-624)."""
        pair_idx, valid, out1, out2, n = self._pair_outputs(
            image, masks, bboxes, pairs)
        d1 = out1[1] if isinstance(out1, tuple) else out1
        d2 = out2[1] if isinstance(out2, tuple) else out2
        arg = D.decode_depth(d1, d2)
        return np.asarray(D.depth_matrix(n, jnp.asarray(pair_idx), arg,
                                         valid))

    def infer_occ_depth_order(self, image, masks, bboxes, pairs='all'):
        """-> (occ (N,N), depth (N,N)) (inference.py:349-436)."""
        pair_idx, valid, out1, out2, n = self._pair_outputs(
            image, masks, bboxes, pairs)
        occ1, dep1 = out1
        occ2, dep2 = out2 if out2 is not None else (None, None)
        i_over_j, j_over_i = D.decode_occ(occ1, occ2)
        arg = D.decode_depth(dep1, dep2)
        occ = np.asarray(D.occ_matrix(n, jnp.asarray(pair_idx), i_over_j,
                                      j_over_i, valid))
        dep = np.asarray(D.depth_matrix(n, jnp.asarray(pair_idx), arg,
                                        valid))
        return occ, dep


def make_folded_predictor(params, stats, cfg, method, dtype=None,
                          use_pallas=False, **kw):
    """Serving-grade OrderPredictor over a BN-folded (optionally bf16)
    ResNet — the bench fast path exposed for evaluation. f32 folded is
    numerically equal to the stock eval forward (up to fp reassociation);
    bf16 trades ~1e-2 logit noise for ~2x throughput (threshold-adjacent
    decisions may flip — use the default f32 predictor for strict parity
    runs).
    """
    from ..models.folding import (fold_resnet, apply_folded,
                                  apply_folded_siamese)
    from ..core.nn import tree_cast

    folded = fold_resnet(params, stats, cfg)
    if dtype is not None:
        folded = tree_cast(folded, dtype)

    def apply_fn(p, s, c, x, train=False):
        return apply_folded(p, c, x, dtype=dtype,
                            use_pallas=use_pallas), s

    def siamese_fn(p, s, c, x):
        # folded-conv1 trick (models/folding.py:95-140): both swap
        # directions from the un-swapped batch — no channel-swapped
        # HBM copy at directions=2
        return apply_folded_siamese(p, c, x, dtype=dtype,
                                    use_pallas=use_pallas)

    return OrderPredictor(apply_fn, cfg, folded, stats, method,
                          siamese_fn=siamese_fn, **kw)


def make_int8_predictor(params, stats, cfg, method, calib_batches,
                        use_pallas=True, **kw):
    """int8 PTQ OrderPredictor (models/quantize.py): BN-fold, calibrate
    activation scales on `calib_batches` (list of prep-normalized
    (N, sz, sz, C) f32 arrays, e.g. a few hundred real pairs), quantize,
    and serve with int8 HBM storage end-to-end. Roughly halves the
    serving HBM traffic vs bf16; decisions may flip on
    threshold-adjacent pairs — validate against the f32 predictor on a
    held-out slice before production use (tests/test_quantize.py does
    this on synthetic data).
    """
    from ..models.folding import fold_resnet
    from ..models import quantize as Q

    folded = fold_resnet(params, stats, cfg)
    scales = Q.calibrate_folded_resnet(folded, cfg, calib_batches)
    qp = Q.quantize_folded_resnet(folded, cfg, scales)

    def apply_fn(p, s, c, x, train=False):
        return Q.apply_folded_int8(p, c, x, use_pallas=use_pallas), s

    def siamese_fn(p, s, c, x):
        # folded-conv1 trick: no channel-swapped HBM copy (see
        # make_folded_predictor)
        return Q.apply_folded_int8_siamese(p, c, x, use_pallas=use_pallas)

    return OrderPredictor(apply_fn, cfg, qp, stats, method,
                          siamese_fn=siamese_fn, **kw)


def make_v2_predictor(params, stats, cfg, method, calib_batches,
                      use_pallas=True, compute_dtype=None,
                      conv2_mode='im2col', hwnc_io='float',
                      pipeline=False, stage_unroll=1, **kw):
    """Boundary-int8 v2 OrderPredictor (models/quantize.py
    quantize_folded_v2): BN-fold, calibrate boundary scales on
    `calib_batches`, then serve with int8 HBM storage at block
    boundaries and bf16 compute inside blocks — measured FASTER than
    the bf16 path (PERFORMANCE.md round 3) with quantization error
    limited to one round/clip per boundary. Decisions may flip on
    threshold-adjacent pairs; tests/test_eval_pipeline.py measures the
    agreement vs the f32 predictor on synthetic data."""
    import jax.numpy as jnp
    from ..models.folding import fold_resnet
    from ..models import quantize as Q

    cdt = jnp.bfloat16 if compute_dtype is None else compute_dtype
    folded = fold_resnet(params, stats, cfg)
    scales = Q.calibrate_folded_resnet(folded, cfg, calib_batches)
    qp = Q.quantize_folded_v2(folded, cfg, scales, compute_dtype=cdt)

    def apply_fn(p, s, c, x, train=False):
        return Q.apply_folded_v2(p, c, x, use_pallas=use_pallas,
                                 conv2_mode=conv2_mode, hwnc_io=hwnc_io,
                                 pipeline=pipeline,
                                 stage_unroll=stage_unroll), s

    def siamese_fn(p, s, c, x):
        return Q.apply_folded_v2_siamese(
            p, c, x, use_pallas=use_pallas, conv2_mode=conv2_mode,
            hwnc_io=hwnc_io, pipeline=pipeline,
            stage_unroll=stage_unroll)

    return OrderPredictor(apply_fn, cfg, qp, stats, method,
                          siamese_fn=siamese_fn, **kw)


class DisparityOrderPredictor:
    """Depth-order from a disparity map (reference net_forward_midas_
    pretrained + the disp_select_method branch of infer_order_sup_depth,
    inference.py:79-104, 582-605): predict disparity ONCE per image,
    compute each instance's region depth (mean/median of 1/disp
    quantile-clipped inside its mask), then compare per pair.

    forward: (1, sz, sz, 3) normalized NHWC -> (1, h', w') disparity.
    """

    def __init__(self, forward, select_method='median', input_size=384):
        assert select_method in ('mean', 'median')
        self.forward = forward
        self.select = select_method
        self.input_size = input_size

        @jax.jit
        def _region_depths(disp, masks_resized):
            pixel_depth = 1.0 / (disp + 1e-6)

            def one(m):
                vals = jnp.where(m > 0.5, pixel_depth, jnp.nan)
                lo = jnp.nanquantile(vals, 0.05)
                hi = jnp.nanquantile(vals, 0.95)
                c = jnp.clip(vals, lo, hi)
                return (jnp.nanmedian(c) if select_method == 'median'
                        else jnp.nanmean(c))

            return jax.vmap(one)(masks_resized)

        self._region_depths = _region_depths

    def infer_depth_order(self, image, masks, bboxes=None, pairs='all',
                          return_disp=False):
        """return_disp: also return the [q05, q95]-clipped disparity
        map (reference infer_order_sup_depth's second return,
        inference.py:588,601,624 — dumped as disp/{img}.png by the
        Tester under save_pngs, tools/test.py:366-371)."""
        from ..ops.pairs import IMAGENET_MEAN, IMAGENET_STD
        from ..ops.resize import resize, resize_nearest
        sz = self.input_size
        rgb = resize(jnp.asarray(image, jnp.float32).transpose(2, 0, 1),
                     sz, sz, 'cubic').transpose(1, 2, 0)
        rgb = jnp.clip(jnp.round(rgb), 0.0, 255.0)
        rgb = (rgb / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        disp = self.forward(rgb[None])[0]
        disp_clipped = None
        if return_disp:
            lo = jnp.quantile(disp, 0.05)
            hi = jnp.quantile(disp, 0.95)
            disp_clipped = np.asarray(jnp.clip(disp, lo, hi))
        masks_r = resize_nearest(jnp.asarray(masks, jnp.float32),
                                 disp.shape[0], disp.shape[1])
        depths = np.asarray(self._region_depths(disp, masks_r))
        n = masks.shape[0]
        order = np.zeros((n, n), int)
        if pairs == 'nbor' and n > 1:
            border = np.asarray(bordering_matrix(jnp.asarray(masks)))
        for i in range(n):
            for j in range(i + 1, n):
                if pairs == 'nbor' and not border[i, j]:
                    continue
                if depths[i] < depths[j]:
                    order[i, j], order[j, i] = 1, 0
                elif depths[i] > depths[j]:
                    order[i, j], order[j, i] = 0, 1
                else:
                    order[i, j] = order[j, i] = 2
        if return_disp:
            return order, disp_clipped
        return order
