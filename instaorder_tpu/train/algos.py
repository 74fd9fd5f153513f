"""Per-algorithm loss semantics (the L4 "model wrapper" layer).

Each factory returns a pure `loss_fn(params, stats, batch, train) ->
(loss, (new_stats, logs))` capturing the reference wrapper's exact training
semantics (models/supervised_order.py):

  * symmetric double forward with swapped masks — fused here into ONE
    2N-batch forward by default (both passes see the same weights; on TPU
    this doubles MXU occupancy instead of running two launches). Set
    fused=False for bit-parity with the reference's sequential passes
    (whose second pass sees BN running stats updated by the first —
    only observable in train-mode BN).
  * activation-before-criterion quirks preserved (see losses.py).
  * label permutation under swap (losses.swap_*).
  * loss scale: the reference divides by world_size then all-reduce-SUMs
    gradients (supervised_order.py:78, distributed_utils.py:27-31); we
    keep the undivided local loss and pmean gradients in the train step —
    mathematically identical.

Batch convention (NHWC, fixed shapes):
  rgb (N,H,W,3) float32 | modal1, modal2 (N,H,W) float32 {0,1}
  occ_order (N,2) float | depth_order (N,) int | is_overlap (N,) int
  count (N,) int | label (N,) int (OrderNet)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import losses as L


def _compute_dtype(hyper):
    """Resolve the mixed-precision policy from config ('compute_dtype':
    'bf16'|'f32'; default full f32 like the reference)."""
    name = hyper.get('compute_dtype', None)
    if name in (None, 'f32', 'float32'):
        return None
    if name in ('bf16', 'bfloat16'):
        return jnp.bfloat16
    raise ValueError(f'unknown compute_dtype {name}')


def assemble_pair_input(batch, use_rgb: bool, swap: bool):
    m1 = batch['modal1'][..., None]
    m2 = batch['modal2'][..., None]
    if swap:
        m1, m2 = m2, m1
    parts = [m1, m2] + ([batch['rgb']] if use_rgb else [])
    return jnp.concatenate(parts, axis=-1)


def _double_forward(apply_fn, cfg, params, stats, batch, use_rgb, train,
                    fused=True, compute_dtype=None, remat=False):
    """Returns (out1, out2, new_stats); out* may be tuples (dual head).

    compute_dtype: mixed-precision policy — cast params + inputs to this
    dtype (e.g. jnp.bfloat16) for the forward/backward while the caller's
    master params stay f32 (grads flow back through the cast in f32).
    BatchNorm statistics stay f32 (core/nn.batch_norm).

    remat: rematerialise the forward under grad (jax.checkpoint) —
    trades recompute for activation memory, enabling larger per-chip
    batches."""
    if compute_dtype is not None:
        from ..core.nn import tree_cast
        params = tree_cast(params, compute_dtype)
        batch = dict(batch)
        for k in ('rgb', 'modal1', 'modal2'):
            if k in batch:
                batch[k] = batch[k].astype(compute_dtype)

    def fwd(p, s, x):
        return apply_fn(p, s, cfg, x, train=train)

    if remat:
        fwd = jax.checkpoint(fwd)
    x1 = assemble_pair_input(batch, use_rgb, swap=False)
    x2 = assemble_pair_input(batch, use_rgb, swap=True)
    if fused:
        out, new_stats = fwd(params, stats,
                             jnp.concatenate([x1, x2], axis=0))
        n = x1.shape[0]
        if isinstance(out, tuple):
            out1 = tuple(o[:n] for o in out)
            out2 = tuple(o[n:] for o in out)
        else:
            out1, out2 = out[:n], out[n:]
        return out1, out2, new_stats
    out1, s1 = fwd(params, stats, x1)
    out2, s2 = fwd(params, s1, x2)
    return out1, out2, s2


def make_insta_order_o(apply_fn, cfg, hyper):
    """InstaOrderNet_o: 2-sigmoid occlusion + BCE both passes
    (reference supervised_order.py:496-548)."""
    use_rgb = hyper.get('use_rgb', False)
    fused = hyper.get('fused_siamese', True)
    cdt = _compute_dtype(hyper)
    remat = hyper.get('remat', False)

    def loss_fn(params, stats, batch, train=True):
        o1, o2, new_stats = _double_forward(apply_fn, cfg, params, stats,
                                            batch, use_rgb, train, fused,
                                            cdt, remat)
        occ1 = batch['occ_order']
        occ2 = L.swap_occ_columns(occ1)
        # fused stable sigmoid+BCE (value-identical to the reference's
        # BCELoss(sigmoid(out)); see losses.bce_with_logits)
        loss = L.bce_with_logits(o1, occ1) + L.bce_with_logits(o2, occ2)
        return loss, (new_stats, {'loss': loss})

    return loss_fn


def make_order_net(apply_fn, cfg, hyper):
    """OrderNet / OrderNet_ext: 1-of-{3,4} CE (on softmaxed outputs) with
    0<->1 label swap (reference supervised_order.py:442-493)."""
    use_rgb = hyper.get('use_rgb', False)
    fused = hyper.get('fused_siamese', True)
    cdt = _compute_dtype(hyper)
    remat = hyper.get('remat', False)

    def loss_fn(params, stats, batch, train=True):
        o1, o2, new_stats = _double_forward(apply_fn, cfg, params, stats,
                                            batch, use_rgb, train, fused,
                                            cdt, remat)
        sm1 = jax.nn.softmax(o1, axis=-1)
        sm2 = jax.nn.softmax(o2, axis=-1)
        lab1 = batch['label']
        lab2 = L.swap_ordernet_labels(lab1)
        loss = L.cross_entropy(sm1, lab1) + L.cross_entropy(sm2, lab2)
        return loss, (new_stats, {'loss': loss})

    return loss_fn


def make_insta_order_d(apply_fn, cfg, hyper):
    """InstaOrderNet_d: 3-way depth CE (on softmax), overlap/distinct
    weighting (reference supervised_order.py:370-438)."""
    use_rgb = hyper.get('use_rgb', False)
    fused = hyper.get('fused_siamese', True)
    ow = hyper['overlap_weight']
    dw = hyper['distinct_weight']
    cdt = _compute_dtype(hyper)
    remat = hyper.get('remat', False)

    def loss_fn(params, stats, batch, train=True):
        o1, o2, new_stats = _double_forward(apply_fn, cfg, params, stats,
                                            batch, use_rgb, train, fused,
                                            cdt, remat)
        sm1 = jax.nn.softmax(o1, axis=-1)
        sm2 = jax.nn.softmax(o2, axis=-1)
        d1 = batch['depth_order']
        d2 = L.swap_depth_labels(d1)
        ovl = batch['is_overlap'] == 1
        dst = batch['is_overlap'] == 0
        lo = (L.cross_entropy_masked(sm1, d1, ovl) +
              L.cross_entropy_masked(sm2, d2, ovl))
        ld = (L.cross_entropy_masked(sm1, d1, dst) +
              L.cross_entropy_masked(sm2, d2, dst))
        loss = lo * ow + ld * dw
        return loss, (new_stats, {'loss': loss})

    return loss_fn


def make_insta_order_od(apply_fn, cfg, hyper):
    """InstaOrderNet_od: joint 2-sigmoid occ + weighted 3-way depth heads
    (reference supervised_order.py:18-95)."""
    use_rgb = hyper.get('use_rgb', True)
    fused = hyper.get('fused_siamese', True)
    ow = hyper['overlap_weight']
    dw = hyper['distinct_weight']
    cdt = _compute_dtype(hyper)
    remat = hyper.get('remat', False)

    def loss_fn(params, stats, batch, train=True):
        (occ_o1, dep_o1), (occ_o2, dep_o2), new_stats = _double_forward(
            apply_fn, cfg, params, stats, batch, use_rgb, train, fused,
            cdt, remat)
        sm1 = jax.nn.softmax(dep_o1, axis=-1)
        sm2 = jax.nn.softmax(dep_o2, axis=-1)
        d1 = batch['depth_order']
        d2 = L.swap_depth_labels(d1)
        occ1 = batch['occ_order']
        occ2 = L.swap_occ_columns(occ1)
        ovl = batch['is_overlap'] == 1
        dst = batch['is_overlap'] == 0
        lo = (L.cross_entropy_masked(sm1, d1, ovl) +
              L.cross_entropy_masked(sm2, d2, ovl))
        ld = (L.cross_entropy_masked(sm1, d1, dst) +
              L.cross_entropy_masked(sm2, d2, dst))
        depth_loss = lo * ow + ld * dw
        occ_loss = (L.bce_with_logits(occ_o1, occ1) +
                    L.bce_with_logits(occ_o2, occ2))
        loss = depth_loss + occ_loss
        logs = {'loss': loss, 'loss_occ': occ_loss, 'loss_depth': depth_loss}
        return loss, (new_stats, logs)

    return loss_fn


def make_insta_depth_net(apply_fn, cfg, hyper, with_occ):
    """InstaDepthNet_{d,od} (reference supervised_order.py:99-367):
    weighted depth CE (on softmax) + optional occ BCE + edge-aware
    smoothness on both passes' disparities + the disparity-order violation
    count over eroded masks — erosion on device (ops.morphology) instead of
    the reference's per-sample scipy host sync.

    apply_fn(params, stats, img, m1, m2, train) -> ((disp, depth, occ),
    new_stats) — wrap models.midas.apply with cfg closed over."""
    ow = hyper['overlap_weight']
    dw = hyper['distinct_weight']
    smooth_w = hyper['smooth_weight']
    dorder_w = hyper['dorder_weight']
    occ_w = hyper.get('occ_order_weight', 0)

    from ..ops.morphology import binary_erosion

    def loss_fn(params, stats, batch, train=True):
        rgb = batch['rgb']
        m1 = batch['modal1']
        m2 = batch['modal2']
        (disp1, dep1, occ1_o), s1 = apply_fn(params, stats, cfg, rgb, m1,
                                             m2, train=train)
        (disp2, dep2, occ2_o), s2 = apply_fn(params, s1, cfg, rgb, m2, m1,
                                             train=train)
        sm1 = jax.nn.softmax(dep1, axis=-1)
        sm2 = jax.nn.softmax(dep2, axis=-1)
        d1 = batch['depth_order']
        d2 = L.swap_depth_labels(d1)
        ovl = batch['is_overlap'] == 1
        dst = batch['is_overlap'] == 0
        loss_overlap = (L.cross_entropy_masked(sm1, d1, ovl) +
                        L.cross_entropy_masked(sm2, d2, ovl)) * ow
        loss_distinct = (L.cross_entropy_masked(sm1, d1, dst) +
                         L.cross_entropy_masked(sm2, d2, dst)) * dw
        loss_occ = 0.0
        if with_occ and occ_w != 0:
            o1 = batch['occ_order']
            o2 = L.swap_occ_columns(o1)
            loss_occ = (L.bce_with_logits(occ1_o, o1) +
                        L.bce_with_logits(occ2_o, o2))
        loss_smooth = 0.0
        if smooth_w != 0:
            loss_smooth = (L.edge_aware_smoothness(disp1, rgb) +
                           L.edge_aware_smoothness(disp2, rgb)) * smooth_w
        loss_dorder = 0.0
        if dorder_w != 0:
            e1 = binary_erosion(m1 > 0.5)
            e2 = binary_erosion(m2 > 0.5)
            count = L.disparity_order_violations(disp1, disp2, e1, e2, d1,
                                                 dst)
            hw = disp1.shape[-2] * disp1.shape[-1]
            loss_dorder = count / hw * dorder_w
        loss = (loss_overlap + loss_distinct + loss_occ + loss_smooth +
                loss_dorder)
        logs = {'loss': loss, 'loss_overlap': loss_overlap,
                'loss_distinct': loss_distinct, 'loss_occ': loss_occ,
                'loss_smooth': loss_smooth, 'loss_disp_order': loss_dorder}
        return loss, (s2, logs)

    return loss_fn


def make_partial_completion_mask(apply_fn, cfg, hyper):
    """PartialCompletionMask (PCNet-M, reference models/partial_completion_
    mask.py:116-126): UNet over cat(mask, eraser) [+ rgb encoder for the
    *res variants], mask-weighted per-pixel CE against the original modal.

    apply_fn(params, stats, cfg, x, rgb=..., train=...) -> (logits NHWC,
    new_stats)."""
    use_rgb = hyper.get('use_rgb', False)
    inmask_weight = hyper.get('inmask_weight', 5.0)

    def loss_fn(params, stats, batch, train=True):
        x = jnp.stack([batch['modal'], batch['eraser']], axis=-1)
        kw = {'rgb': batch['rgb']} if use_rgb else {}
        logits, new_stats = apply_fn(params, stats, cfg, x, train=train,
                                     **kw)
        loss = L.mask_weighted_cross_entropy(
            logits, batch['target'], batch['eraser'],
            inmask_weight=inmask_weight, outmask_weight=1.0)
        return loss, (new_stats, {'loss': loss})

    return loss_fn


ALGOS = {
    'OrderNet': make_order_net,
    'OrderNet_ext': make_order_net,
    'InstaOrderNet_o': make_insta_order_o,
    'InstaOrderNet_d': make_insta_order_d,
    'InstaOrderNet_od': make_insta_order_od,
    'InstaDepthNet_d': lambda a, c, h: make_insta_depth_net(a, c, h, False),
    'InstaDepthNet_od': lambda a, c, h: make_insta_depth_net(a, c, h, True),
    'PartialCompletionMask': make_partial_completion_mask,
}


def make_loss(algo: str, apply_fn, cfg, hyper):
    if algo not in ALGOS:
        raise KeyError(f"unknown algo '{algo}'; have {sorted(ALGOS)}")
    return ALGOS[algo](apply_fn, cfg, hyper)
