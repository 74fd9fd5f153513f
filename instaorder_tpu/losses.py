"""Loss functions with torch-parity semantics.

Every order model in the reference applies its criterion to *already
activated* outputs — nn.CrossEntropyLoss on softmaxed logits and nn.BCELoss
on sigmoided logits (reference models/supervised_order.py:54-55,86-87,
400-404,415-419,468-487,521-543). The CE-on-softmax double-normalisation is
a quirk that changes the training loss surface, so it is preserved
faithfully here: callers pass probabilities, and `cross_entropy` applies
log_softmax to them exactly as torch's criterion would to its input.

Masked variants mirror the reference's boolean-indexing + guarded-sum
pattern (`if mask.sum() > 0`, supervised_order.py:67-72) with fixed-shape
masking: sum(per_sample * mask) / max(count, 1), and a zero result when the
mask is empty.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce(probs, targets):
    """torch nn.BCELoss (mean): inputs are probabilities in [0, 1]."""
    p = probs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    logp = jnp.clip(jnp.log(p), -100.0, None)
    log1p = jnp.clip(jnp.log1p(-p), -100.0, None)
    return -jnp.mean(t * logp + (1.0 - t) * log1p)


def bce_with_logits(logits, targets):
    """Numerically-stable fused sigmoid+BCE. Forward value matches
    bce(sigmoid(logits), targets) (what the reference computes) to fp
    precision, but the gradient is the algebraically-simplified
    (sigmoid(o) - t)/N — no inf*0 NaNs when the sigmoid saturates."""
    o = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    # log(sigmoid(o)) = -softplus(-o); log(1-sigmoid(o)) = -softplus(o)
    per = t * jax.nn.softplus(-o) + (1.0 - t) * jax.nn.softplus(o)
    return jnp.mean(per)


def cross_entropy(inputs, labels):
    """torch nn.CrossEntropyLoss (mean). `inputs` is whatever the reference
    passes — typically softmax probabilities (the double-softmax quirk)."""
    logp = jax.nn.log_softmax(inputs.astype(jnp.float32), axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                 axis=-1)[:, 0]
    return -jnp.mean(picked)


def cross_entropy_masked(inputs, labels, mask):
    """CE over the rows where mask is True; 0.0 if none are (matching the
    reference's `if mask.sum() > 0` guard). Labels may contain -1 for
    masked-out rows (clamped before the gather; never read)."""
    logp = jax.nn.log_softmax(inputs.astype(jnp.float32), axis=-1)
    safe = jnp.maximum(labels, 0)
    picked = -jnp.take_along_axis(logp, safe[:, None].astype(jnp.int32),
                                  axis=-1)[:, 0]
    m = mask.astype(jnp.float32)
    count = jnp.sum(m)
    return jnp.where(count > 0, jnp.sum(picked * m) / jnp.maximum(count, 1.0),
                     0.0)


def swap_depth_labels(depth_order):
    """Label permutation under mask swap: 0<->1, 2 fixed
    (reference supervised_order.py:40-41,121-123)."""
    return jnp.where(depth_order == 2, 2, 1 - depth_order)


def swap_occ_columns(occ_order):
    """(N, 2) occlusion targets under mask swap: column exchange
    (reference supervised_order.py:48,516)."""
    return occ_order[:, ::-1]


def swap_ordernet_labels(labels):
    """OrderNet 1-of-{3,4} label permutation under swap: 0<->1, 2 and 3
    fixed (reference supervised_order.py:459-463)."""
    return jnp.where(labels == 0, 1, jnp.where(labels == 1, 0, labels))


def min_max_norm(disp, eps=1e-7):
    """Per-image min-max normalisation of (N, H, W) disparity
    (reference supervised_order.py:212-215 — note the denominator uses
    max, not max-min: kept as-is for parity)."""
    mn = jnp.min(disp, axis=(-2, -1), keepdims=True)
    mx = jnp.max(disp, axis=(-2, -1), keepdims=True)
    return (disp - mn) / (mx + eps)


def edge_aware_smoothness(disp, rgb, eps=1e-7):
    """Edge-aware disparity smoothness (reference supervised_order.py:
    217-237). disp: (N, H, W); rgb: (N, H, W, 3) normalized image."""
    d = min_max_norm(disp, eps)
    mean_d = jnp.mean(d, axis=(-2, -1), keepdims=True)
    d = d / (mean_d + eps)
    gx = jnp.abs(d[..., :, :-1] - d[..., :, 1:])
    gy = jnp.abs(d[..., :-1, :] - d[..., 1:, :])
    igx = jnp.mean(jnp.abs(rgb[..., :, :-1, :] - rgb[..., :, 1:, :]), axis=-1)
    igy = jnp.mean(jnp.abs(rgb[..., :-1, :, :] - rgb[..., 1:, :, :]), axis=-1)
    gx = gx * jnp.exp(-igx)
    gy = gy * jnp.exp(-igy)
    return jnp.mean(gx) + jnp.mean(gy)


def disparity_order_violations(disp1, disp2, m1_eroded, m2_eroded,
                               depth_order, distinct_mask):
    """The InstaDepthNet disparity-order violation count
    (reference supervised_order.py:157-179), fully on device.

    For each distinct (non-overlap) pair with order 0 (1 closer than 2):
      count pixels of eroded mask1 whose disp1 fails to exceed max(disp1 in
      eroded mask2), pixels of mask2 above min(disp1 in mask1), and the two
      symmetric terms on the swapped pass disp2. Order 1 flips inequalities.

    NOTE: in torch these comparisons carry no gradient (bool tensors) —
    the term acts as a differentiable-free penalty count; jnp comparisons
    reproduce that exactly.

    disp*: (N, H, W); m*_eroded: (N, H, W) bool; depth_order: (N,) int;
    distinct_mask: (N,) bool. Returns scalar count (float32, no grad).
    """
    big = jnp.float32(-3.4e38)
    small = jnp.float32(3.4e38)
    m1 = m1_eroded.astype(bool)
    m2 = m2_eroded.astype(bool)

    def mmax(d, m):  # max over mask; empty mask -> -inf-ish
        return jnp.max(jnp.where(m, d, big), axis=(-2, -1))

    def mmin(d, m):
        return jnp.min(jnp.where(m, d, small), axis=(-2, -1))

    def counts(d, flip):
        max2 = mmax(d, m2)[:, None, None]
        min1 = mmin(d, m1)[:, None, None]
        if not flip:  # order==0 on pass 1: want d[m1] > max(d[m2])
            c1 = jnp.sum((d <= max2) & m1, axis=(-2, -1))
            c2 = jnp.sum((min1 <= d) & m2, axis=(-2, -1))
        else:  # inequalities reversed
            c1 = jnp.sum((d >= max2) & m1, axis=(-2, -1))
            c2 = jnp.sum((min1 >= d) & m2, axis=(-2, -1))
        return (c1 + c2).astype(jnp.float32)

    per0 = counts(disp1, False) + counts(disp2, True)   # depth_order == 0
    per1 = counts(disp1, True) + counts(disp2, False)   # depth_order == 1
    per = jnp.where(depth_order == 0, per0,
                    jnp.where(depth_order == 1, per1, 0.0))
    per = jnp.where(distinct_mask, per, 0.0)
    return jnp.sum(per)


def mask_weighted_cross_entropy(logits, target, mask, inmask_weight=5.0,
                                outmask_weight=1.0):
    """PCNet-M per-pixel CE with eraser-region weighting (reference
    models/losses.py:60-88): sum of pixel CEs weighted in/out of `mask`,
    normalised by N*H*W. logits: (N, H, W, C); target/mask: (N, H, W)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    pix = -jnp.take_along_axis(logp, target[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    w = jnp.where(mask.astype(bool), inmask_weight, outmask_weight)
    n, h, wd = target.shape
    return jnp.sum(pix * w) / (n * h * wd)


def l2_with_ignore(pred, target, ignore_value=None):
    """reference models/losses.py:45-57."""
    if ignore_value is None:
        return jnp.mean((pred - target.astype(jnp.float32)) ** 2)
    m = (target != ignore_value).astype(jnp.float32)
    diff = (pred - target.astype(jnp.float32)) ** 2 * m
    return jnp.sum(diff) / jnp.maximum(jnp.sum(m), 1.0)


def adversarial_loss(outputs, is_real, is_disc=None, loss_type='nsgan',
                     real_label=1.0, fake_label=0.0):
    """GAN loss (reference models/losses.py:5-42): nsgan (BCE on sigmoid
    outputs), lsgan (MSE), hinge."""
    o = outputs.astype(jnp.float32)
    if loss_type == 'hinge':
        if is_disc:
            o = -o if is_real else o
            return jnp.mean(jax.nn.relu(1.0 + o))
        return jnp.mean(-o)
    label = jnp.full_like(o, real_label if is_real else fake_label)
    if loss_type == 'nsgan':
        return bce(o, label)
    if loss_type == 'lsgan':
        return jnp.mean((o - label) ** 2)
    raise ValueError(loss_type)


def gram_matrix(feat):
    """(N, H, W, C) -> (N, C, C) normalised Gram (losses.py:91-97)."""
    n, h, w, c = feat.shape
    f = feat.reshape(n, h * w, c)
    return jnp.einsum('nxc,nxd->ncd', f, f) / (c * h * w)


def total_variation_loss(image):
    """(N, H, W, C) mean abs one-pixel shifts (losses.py:100-104)."""
    return (jnp.mean(jnp.abs(image[:, :, :-1] - image[:, :, 1:])) +
            jnp.mean(jnp.abs(image[:, :-1] - image[:, 1:])))


def inpainting_loss(inp, mask, output, gt, extractor=None):
    """Hole/valid/perceptual/style/tv losses (losses.py:107-145). NHWC;
    `extractor(img_nhwc) -> [feat1, feat2, feat3]` (e.g. a VGG16 stand-in);
    perceptual/style terms are skipped when no extractor is given."""
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    comp = mask * inp + (1 - mask) * output
    out = {'hole': l1((1 - mask) * output, (1 - mask) * gt),
           'valid': l1(mask * output, mask * gt)}
    if extractor is not None:
        def to3(t):
            return t if t.shape[-1] == 3 else jnp.tile(t, (1, 1, 1, 3))
        f_comp = extractor(to3(comp))
        f_out = extractor(to3(output))
        f_gt = extractor(to3(gt))
        out['prc'] = sum(l1(a, g) + l1(c, g) for a, c, g in
                         zip(f_out, f_comp, f_gt))
        out['style'] = sum(
            l1(gram_matrix(a), gram_matrix(g)) +
            l1(gram_matrix(c), gram_matrix(g))
            for a, c, g in zip(f_out, f_comp, f_gt))
    out['tv'] = total_variation_loss(comp)
    return out
