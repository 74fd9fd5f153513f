"""Fused on-device pair preprocessing — the framework's hot op.

The reference prepares every instance pair on the host with cv2 inside a
Python double loop, with one H2D round-trip per pair (inference.py:443-510,
occ_order_dataset.py:138-180). Here the whole image's N(N-1)/2 pairs become
one batched device computation:

  image (H, W, 3) + masks (N, H, W) + per-pair crop rois (P, 4)
    -> (P, sz, sz, 5) model-ready batch

Per-pair crop+resize+pad is expressed as two separable gather-interp
stages whose tap indices/weights are computed on device from the roi
scalars (so one compiled program covers every pair geometry — no
recompile per image). Semantics match cv2 exactly:

  * crop window pads with 0 outside the image (utils/data_utils.py:104-124)
  * resize taps clamp to the crop window (cv2 BORDER_REPLICATE inside the
    crop, zeros outside the image)
  * RGB: INTER_CUBIC (A=-0.75, half-pixel); masks: INTER_NEAREST
    (asymmetric floor mapping)

Everything is batch-dim `P`, so pair-sharding across chips is just a
`data`-axis sharding of this op's output (SURVEY.md §5 "pair sharding").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .resize import _cubic_kernel

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def pair_rois(bboxes: jnp.ndarray, pair_idx: jnp.ndarray) -> jnp.ndarray:
    """Union-bbox square crop roi for each pair (device version of
    utils/data_utils pair geometry; inference.py:361-365).

    bboxes: (N, 4) float xywh; pair_idx: (P, 2) int. Returns (P, 4)
    float [x, y, size, size] — int-truncated like the reference.
    """
    b1 = bboxes[pair_idx[:, 0]]
    b2 = bboxes[pair_idx[:, 1]]
    left = jnp.minimum(b1[:, 0], b2[:, 0])
    top = jnp.minimum(b1[:, 1], b2[:, 1])
    right = jnp.maximum(b1[:, 0] + b1[:, 2], b2[:, 0] + b2[:, 2])
    bottom = jnp.maximum(b1[:, 1] + b1[:, 3], b2[:, 1] + b2[:, 3])
    w = right - left
    h = bottom - top
    size = jnp.maximum(jnp.sqrt(w * h * 2.0),
                       jnp.maximum(w * 1.1, h * 1.1))
    cx = left + w / 2.0
    cy = top + h / 2.0
    x = jnp.trunc(cx - size / 2.0)
    y = jnp.trunc(cy - size / 2.0)
    s = jnp.trunc(size)
    return jnp.stack([x, y, s, s], axis=1)


def _nearest_taps(roi_off, roi_size, out_size, src_size):
    """cv2 INTER_NEAREST indices for a cropped window: (out_size,) idx into
    the source axis plus validity (inside-image)."""
    d = jnp.arange(out_size, dtype=jnp.float32)
    t = jnp.floor(d * roi_size / out_size)
    t = jnp.clip(t, 0.0, roi_size - 1.0)  # clamp inside crop window
    src = t + roi_off
    valid = (src >= 0) & (src <= src_size - 1)
    return jnp.clip(src, 0, src_size - 1).astype(jnp.int32), valid


def _cubic_taps(roi_off, roi_size, out_size, src_size):
    """cv2 INTER_CUBIC 4-tap indices/weights for a cropped window.
    Returns idx (out_size, 4) int32, w (out_size, 4) f32, where taps clamp
    to the crop window (replicate) and invalid (outside-image) taps get a
    validity flag for zero-padding."""
    d = jnp.arange(out_size, dtype=jnp.float32)
    f = (d + 0.5) * roi_size / out_size - 0.5
    x0 = jnp.floor(f)
    t = f - x0
    ks = jnp.arange(-1, 3, dtype=jnp.float32)
    w = _cubic_kernel(ks[None, :] - t[:, None], xp=jnp).astype(jnp.float32)
    tap = x0[:, None] + ks[None, :]
    tap = jnp.clip(tap, 0.0, roi_size - 1.0)  # replicate inside crop
    src = tap + roi_off
    valid = (src >= 0) & (src <= src_size - 1)
    return jnp.clip(src, 0, src_size - 1).astype(jnp.int32), w, valid


def _linear_taps(roi_off, roi_size, out_size, src_size):
    """cv2 INTER_LINEAR 2-tap indices/weights for a cropped window."""
    d = jnp.arange(out_size, dtype=jnp.float32)
    f = (d + 0.5) * roi_size / out_size - 0.5
    x0 = jnp.floor(f)
    t = f - x0
    ks = jnp.arange(0, 2, dtype=jnp.float32)
    w = jnp.stack([1.0 - t, t], axis=1)
    tap = x0[:, None] + ks[None, :]
    tap = jnp.clip(tap, 0.0, roi_size - 1.0)
    src = tap + roi_off
    valid = (src >= 0) & (src <= src_size - 1)
    return jnp.clip(src, 0, src_size - 1).astype(jnp.int32), w, valid


def _crop_resize_interp_one(img, roi, out_size, method='cubic'):
    """img: (H, W, C); roi: (4,) float xywh -> (out, out, C)."""
    H, W = img.shape[0], img.shape[1]
    taps = _cubic_taps if method == 'cubic' else _linear_taps
    yi, wy, vy = taps(roi[1], roi[3], out_size, H)
    xi, wx, vx = taps(roi[0], roi[2], out_size, W)
    # stage 1: rows. (out, k) taps into H -> (out, W, C)
    rows = img[yi]                                   # (out, k, W, C)
    rows = rows * (wy * vy)[..., None, None]
    rows = jnp.sum(rows, axis=1)                     # (out, W, C)
    # stage 2: cols. (out, k) taps into W -> (out, out, C)
    cols = rows[:, xi]                               # (out, out, k, C)
    cols = cols * (wx * vx)[None, :, :, None]
    return jnp.sum(cols, axis=2)


def _crop_resize_nearest_one(mask, roi, out_size):
    """mask: (H, W); roi: (4,) -> (out, out) nearest with 0-pad."""
    H, W = mask.shape
    yi, vy = _nearest_taps(roi[1], roi[3], out_size, H)
    xi, vx = _nearest_taps(roi[0], roi[2], out_size, W)
    out = mask[yi][:, xi]
    return out * (vy[:, None] & vx[None, :]).astype(mask.dtype)


def _interp_matrix(roi_off, roi_size, out_size, src_size, method='cubic'):
    """(out_size, src_size) dense interpolation matrix for one axis of a
    cropped window — the crop+resize as a matmul. Out-of-image taps are
    zero (the crop's zero padding); taps clamp to the crop window
    (replicate).

    Built by DIRECT grid evaluation: interior weight at source column s
    is kernel((c - x0) - frac) with c = s - roi_off — the SAME float
    expression as the tap-wise kernel(k - frac) (c - x0 is an exact
    small integer), so the grid is bit-identical to the tap scatter
    (test-enforced) — plus the clamp-accumulated tap mass at the crop
    borders (columns c == 0 and c == floor(roi_size - 1), where the
    original's int32 truncation of the fractional high clamp lands).
    An earlier formulation scattered per-tap weights through a
    (out, k, src) one-hot — 4x the grid traffic for the same matrix.
    Requires integer-valued roi_off (pair_rois truncs; fractional size
    is handled exactly via chigh)."""
    if method == 'nearest':
        idx, valid = _nearest_taps(roi_off, roi_size, out_size, src_size)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, src_size), 1)
        return (idx[:, None] == iota) * valid[:, None]
    d = jnp.arange(out_size, dtype=jnp.float32)
    f = (d + 0.5) * roi_size / out_size - 0.5
    x0 = jnp.floor(f)
    if method == 'cubic':
        ks = jnp.arange(-1, 3, dtype=jnp.float32)
        kern = lambda t: _cubic_kernel(t, xp=jnp).astype(jnp.float32)
    else:
        ks = jnp.arange(0, 2, dtype=jnp.float32)
        kern = lambda t: jnp.maximum(0.0, 1.0 - jnp.abs(t))
    frac = f - x0
    w = kern(ks[None, :] - frac[:, None])              # (out, k) taps
    tap = x0[:, None] + ks[None, :]
    low = jnp.sum(w * (tap < 0.0), axis=1)             # clamped -> c=0
    chigh = jnp.floor(roi_size - 1.0)
    high = jnp.sum(w * (tap > roi_size - 1.0), axis=1)
    c = (jax.lax.broadcasted_iota(jnp.float32, (1, src_size), 1)
         - roi_off)                                    # crop coords
    inwin = (c >= 0.0) & (c <= roi_size - 1.0)
    m = kern((c - x0[:, None]) - frac[:, None]) * inwin
    return (m + low[:, None] * (c == 0.0)
            + high[:, None] * (c == chigh))


def _mask_pair_batch(masks, pair_idx, rois, out_size):
    """Masks as nearest one-hot matmuls -> (P, 2, out, out) bf16. A
    one-hot bf16 matmul over {0,1} data is exact, so this runs at full
    MXU speed with no parity loss.

    int8 storage end-to-end on the mask path: every intermediate is
    exactly {0, 1} (one-hot nearest resampling of binary masks), so s8
    is bit-exact and HALVES the two big HBM tensors vs bf16 — the
    (P, 2, H, W) gather output and the (P, 2, H, out) m1 intermediate
    (~2 GB/step at serving batch). The s8<->bf16 converts fuse into
    the producing/consuming matmuls; cast BEFORE the per-pair gather:
    each instance is duplicated into ~N-1 pairs, so gathering f32 and
    casting after moves 4x the bytes."""
    H, W = masks.shape[1], masks.shape[2]
    Wyn = jax.vmap(lambda r: _interp_matrix(r[1], r[3], out_size, H,
                                            'nearest'))(rois)
    Wxn = jax.vmap(lambda r: _interp_matrix(r[0], r[2], out_size, W,
                                            'nearest'))(rois)
    masks_sel = masks.astype(jnp.int8)[pair_idx.reshape(-1)].reshape(
        pair_idx.shape[0], 2, H, W)
    m1 = jnp.einsum('pjw,pmhw->pmhj', Wxn.astype(jnp.bfloat16),
                    masks_sel.astype(jnp.bfloat16)).astype(jnp.int8)
    return jnp.einsum('pih,pmhj->pmij', Wyn.astype(jnp.bfloat16),
                      m1.astype(jnp.bfloat16))


@functools.partial(jax.jit,
                   static_argnames=('out_size', 'normalize', 'rgb_method',
                                    'precision', 'dtype', 'stage1_dtype'))
def build_pair_batch_matmul(image, masks, pair_idx, rois, out_size=256,
                            normalize=True, rgb_method='cubic',
                            precision=jax.lax.Precision.HIGH, dtype=None,
                            stage1_dtype=None):
    """MXU formulation of the fused pair batch: per-pair interpolation
    matrices + two batched matmuls for the RGB (the gathers in the default
    path lower poorly on TPU; this keeps the crop-resize on the systolic
    array). Masks stay on the (exact) nearest-gather path.

    precision: HIGH (bf16_3x, ~f32 accurate — differences vanish under the
    uint8 round) or HIGHEST for bit-level f32.
    stage1_dtype: storage dtype of the (P, H, out, C) intermediate
    between the two interpolation matmuls (default f32). bf16 halves
    its HBM traffic (~800MB at serving batch); pixel values after the
    uint8 round can differ by 1 LSB vs cv2 where the bf16 rounding of
    the row-interpolated value lands on the other side of .5 — a
    serving knob, not for parity runs.
    """
    H, W = image.shape[0], image.shape[1]
    Wy = jax.vmap(lambda r: _interp_matrix(r[1], r[3], out_size, H,
                                           rgb_method))(rois)
    Wx = jax.vmap(lambda r: _interp_matrix(r[0], r[2], out_size, W,
                                           rgb_method))(rois)
    img = image.astype(jnp.float32)
    # contract W then H: (P,H,out,C) intermediate is the smaller order
    stage1 = jnp.einsum('pjw,hwc->phjc', Wx, img, precision=precision)
    if stage1_dtype is not None:
        stage1 = stage1.astype(stage1_dtype)
    rgb_out = jnp.einsum('pih,phjc->pijc', Wy, stage1, precision=precision,
                         preferred_element_type=jnp.float32)
    rgb_out = jnp.clip(jnp.round(rgb_out), 0.0, 255.0)
    if normalize:
        rgb_out = (rgb_out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    m_out = _mask_pair_batch(masks, pair_idx, rois, out_size)
    out_dtype = rgb_out.dtype if dtype is None else dtype
    m_out = m_out.astype(out_dtype)
    rgb_out = rgb_out.astype(out_dtype)
    return jnp.concatenate([m_out[:, 0, :, :, None], m_out[:, 1, :, :, None],
                            rgb_out], axis=-1)


# The fused prep kernels carry one 512-byte scalar-prefetch record per
# pair (roi-derived window offsets + interp metadata) in SMEM, whose
# budget is 1 MB on v5e: 3240 pairs asked for u8[1,658,880] and failed
# AOT compile ("Allocation would exceed memory (size=1048576) ::
# space=smem :: fused_prep_pairs"). 1620 pairs (829 KB) is the
# hardware-proven serving size, so calls are chunked to that cap and
# concatenated — the <=cap path traces exactly as before (cache-stable).
_FUSED_PREP_PAIR_CAP = 1620


@functools.partial(jax.jit,
                   static_argnames=('out_size', 'dtype', 'passes',
                                    'fuse_masks', 'interpret',
                                    'pairs_per_call'))
def build_pair_batches_fused(images, masks, pair_idx, rois, out_size=256,
                             dtype=jnp.bfloat16, passes=3,
                             fuse_masks=False, interpret=False,
                             pairs_per_call=_FUSED_PREP_PAIR_CAP):
    """Multi-scene pair prep with the RGB crop+resize as ONE pallas
    kernel (ops/prep_pallas.fused_prep_rgb: in-kernel interp matrices,
    VMEM-resident row-interp intermediate, windowed-K matmuls) + the
    exact einsum mask path — or, with fuse_masks, ALL 5 channels in
    one kernel (prep_pallas.fused_prep_pairs: the mask nearest resize
    runs in-kernel as windowed one-hot matmuls, skipping the per-pair
    (P, 2, H, W) gather + m1 HBM round trips). images (S, H, W, 3),
    masks (S, N, H, W), rois (S, P, 4) -> (S*P, out, out, 5) — same
    values as the vmapped build_pair_batch_matmul default: masks
    exact, RGB up to rare 1-LSB rounding ties
    (tests/test_prep_pallas.py). passes: 3 = serving precision (HIGH),
    1 = the --prep-precision 'default' bf16 knob.

    Non-8-multiple image dims (real COCO sizes, e.g. 427-wide) are
    zero-padded bottom/right to the kernels' 8-multiple precondition.
    This is VALUE-exact vs the einsum path on the original size:
    out-of-image taps contribute zero there (the crop's zero padding,
    _interp_matrix), and a padded zero pixel times its kernel weight
    is the same zero — test_prep_pallas5_non8_multiple_dims."""
    S, P = rois.shape[0], rois.shape[1]
    H, W = images.shape[1], images.shape[2]
    if H % 8 or W % 8:
        ph, pw = (-H) % 8, (-W) % 8
        images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
        masks = jnp.pad(masks, ((0, 0), (0, 0), (0, ph), (0, pw)))
    cap = max(1, pairs_per_call)

    def _chunked(call, *scene_args):
        """Run `call` under the per-call SMEM pair cap. scene_args are
        the arrays with a leading scene axis (rois always last)."""
        if S * P <= cap:
            return call(*scene_args, pair_idx)
        if P <= cap:                       # chunk whole scenes
            sc = max(1, cap // P)
            return jnp.concatenate(
                [call(*(a[s0:s0 + sc] for a in scene_args), pair_idx)
                 for s0 in range(0, S, sc)], axis=0)
        # a single scene exceeds the cap: chunk the pair axis and
        # reassemble scene-major (S, P, ...) order
        outs = []
        for p0 in range(0, P, cap):
            o = call(*(a[:, p0:p0 + cap] if a is scene_args[-1] else a
                       for a in scene_args), pair_idx[p0:p0 + cap])
            outs.append(o.reshape(S, -1, *o.shape[1:]))
        stacked = jnp.concatenate(outs, axis=1)
        return stacked.reshape(S * P, *stacked.shape[2:])

    if fuse_masks:
        from .prep_pallas import fused_prep_pairs
        out5 = _chunked(
            lambda im, mk, ro, pi: fused_prep_pairs(
                im, mk, pi, ro, out_size=out_size, out_dtype=dtype,
                passes=passes, interpret=interpret),
            images, masks, rois)
        return jnp.transpose(out5, (0, 2, 3, 1))
    from .prep_pallas import fused_prep_rgb
    rgb = _chunked(
        lambda im, ro, pi: fused_prep_rgb(
            im, ro, out_size=out_size, out_dtype=dtype,
            passes=passes, interpret=interpret),
        images, rois)
    rgb = jnp.transpose(rgb, (0, 2, 3, 1))
    m = jax.vmap(lambda mk, r: _mask_pair_batch(mk, pair_idx, r,
                                                out_size))(masks, rois)
    m = m.reshape(S * P, 2, out_size, out_size).astype(dtype)
    return jnp.concatenate([m[:, 0, :, :, None], m[:, 1, :, :, None],
                            rgb], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=('out_size', 'normalize', 'rgb_method'))
def build_pair_batch_rois(image, masks, pair_idx, rois, out_size=256,
                          normalize=True, rgb_method='cubic'):
    """Fused pair batch from explicit per-pair crop rois.

    image: (H, W, 3) float32 in [0, 255] (raw uint8 range)
    masks: (N, H, W) float32/uint8 {0, 1}
    pair_idx: (P, 2) int32 — (i, j) per pair (pad with (0, 0); mask
      invalid pairs downstream)
    rois: (P, 4) float xywh crop windows (may exceed image bounds)
    rgb_method: 'cubic' for patch mode (inference.py:366-368), 'linear'
      for image mode.

    Returns (P, sz, sz, 5): [modal_i, modal_j, normalized rgb].
    """
    rgb = image.astype(jnp.float32)

    crop_rgb = jax.vmap(
        lambda r: _crop_resize_interp_one(rgb, r, out_size, rgb_method))
    rgb_out = crop_rgb(rois)                        # (P, sz, sz, 3)
    # the reference resizes uint8 with cv2 (saturating, rounded) before
    # the float conversion — emulate so cubic overshoot clamps identically
    rgb_out = jnp.clip(jnp.round(rgb_out), 0.0, 255.0)
    if normalize:
        rgb_out = (rgb_out / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    def crop_mask(pair, roi):
        mi = _crop_resize_nearest_one(masks[pair[0]].astype(jnp.float32),
                                      roi, out_size)
        mj = _crop_resize_nearest_one(masks[pair[1]].astype(jnp.float32),
                                      roi, out_size)
        return mi, mj

    mi, mj = jax.vmap(crop_mask)(pair_idx, rois)
    return jnp.concatenate(
        [mi[..., None], mj[..., None], rgb_out], axis=-1)


@functools.partial(jax.jit,
                   static_argnames=('out_size', 'normalize', 'rgb_method'))
def build_pair_batch(image, masks, bboxes, pair_idx, out_size=256,
                     normalize=True, rgb_method='cubic'):
    """The fused "patch"-mode pair batch op: per-pair union-bbox square
    crops (see pair_rois) -> (P, sz, sz, 5)."""
    rois = pair_rois(bboxes, pair_idx)
    return build_pair_batch_rois(image, masks, pair_idx, rois,
                                 out_size=out_size, normalize=normalize,
                                 rgb_method=rgb_method)


@functools.partial(jax.jit,
                   static_argnames=('out_size', 'normalize', 'rgb_method'))
def build_pair_batch_shared_rgb(image, masks, pair_idx, out_size=384,
                                normalize=True, rgb_method='linear'):
    """The "resize"-mode pair batch: one shared full-image resize, masks
    indexed per pair. rgb_method: 'linear' matches the train dataset
    (occ_order_dataset.py:84), 'cubic' matches the eval transform_resize
    path (MiDaS Resize with INTER_CUBIC, utils/data_utils.py:37-53).
    Returns (P, sz, sz, 5)."""
    from .resize import resize, resize_nearest
    rgb = resize(image.astype(jnp.float32).transpose(2, 0, 1), out_size,
                 out_size, rgb_method).transpose(1, 2, 0)
    rgb = jnp.clip(jnp.round(rgb), 0.0, 255.0)  # uint8-path emulation
    if normalize:
        rgb = (rgb / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    masks_r = resize_nearest(masks.astype(jnp.float32), out_size, out_size)
    mi = masks_r[pair_idx[:, 0]]
    mj = masks_r[pair_idx[:, 1]]
    P = pair_idx.shape[0]
    rgb_b = jnp.broadcast_to(rgb[None], (P, out_size, out_size, 3))
    return jnp.concatenate([mi[..., None], mj[..., None], rgb_b], axis=-1)


def all_pair_indices(n: int, p_max: int | None = None):
    """Host helper: upper-triangle (i, j), i<j pair list, padded to p_max.
    Returns (pair_idx (P, 2) int32, valid (P,) bool)."""
    idx = [(i, j) for i in range(n) for j in range(i + 1, n)]
    p = len(idx)
    if p_max is None:
        p_max = p
    assert p_max >= p
    out = np.zeros((p_max, 2), np.int32)
    valid = np.zeros((p_max,), bool)
    if p:
        out[:p] = np.asarray(idx, np.int32)
        valid[:p] = True
    return out, valid
