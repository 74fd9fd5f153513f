"""fused_prep_rgb (ops/prep_pallas.py) — the one-pallas-call RGB prep.

Parity contract: pixels after the uint8 round match the exact gather
path (ops/pairs.build_pair_batch_rois) except rare 1-LSB rounding
ties — the same serving bar as the einsum HIGH path
(test_pairs.test_patch_mode_matches_host_reference). The static
source windows must cover every roi geometry pair_rois can produce,
including the worst-case size max(sqrt(2*H*W), 1.1*max(H, W)) and
crops hanging off the image (reference zero-padding,
/root/reference/utils/data_utils.py:104-124)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instaorder_tpu.ops import pairs as P
from instaorder_tpu.ops.prep_pallas import fused_prep_rgb


def _exact_rgb(image, rois, out_size):
    masks = jnp.zeros((2,) + image.shape[:2], jnp.float32)
    pidx = jnp.zeros((rois.shape[0], 2), jnp.int32)
    out = P.build_pair_batch_rois(jnp.asarray(image), masks, pidx,
                                  jnp.asarray(rois), out_size=out_size,
                                  normalize=False)
    return np.asarray(out)[..., 2:]


def _check(image, rois, out_size, max_frac=0.01):
    S = 1
    got = fused_prep_rgb(jnp.asarray(image)[None],
                         jnp.asarray(rois)[None], out_size=out_size,
                         normalize=False, out_dtype=jnp.float32,
                         interpret=True)
    got = np.transpose(np.asarray(got, np.float32), (0, 2, 3, 1))
    want = _exact_rgb(image, rois, out_size)
    d = np.abs(got - want)
    assert d.max() <= 1.0, (d.max(), 'pixel deviation beyond a rounding tie')
    assert (d > 0).mean() < max_frac, ((d > 0).mean(), 'ties must be rare')


def test_prep_pallas_random_scene_rois():
    rng = np.random.RandomState(0)
    H, W, N = 96, 128, 5
    image = rng.randint(0, 255, (H, W, 3)).astype(np.float32)
    bboxes = np.zeros((N, 4), np.float32)
    for k in range(N):
        y0, x0 = rng.randint(0, H - 20), rng.randint(0, W - 20)
        hh, ww = rng.randint(3, 70, 2)
        bboxes[k] = [x0, y0, ww, hh]
    pidx, _ = P.all_pair_indices(N)
    rois = np.asarray(P.pair_rois(jnp.asarray(bboxes), jnp.asarray(pidx)))
    _check(image, rois, 64)


def test_prep_pallas_adversarial_rois():
    """Hand-built windows: worst-case size (the pair_rois bound),
    crops hanging off every image edge, tiny upscales, and sub-pixel
    fractional sizes."""
    rng = np.random.RandomState(1)
    H, W = 96, 128
    image = rng.randint(0, 255, (H, W, 3)).astype(np.float32)
    szmax = float(np.trunc(max(np.sqrt(2.0 * H * W), 1.1 * max(H, W))))
    rois = np.array([
        [0, 0, szmax, szmax],              # worst-case size, at origin
        [-60, -40, szmax, szmax],          # worst-case, hanging off TL
        [W - 10, H - 10, szmax, szmax],    # hanging off BR
        [-130, 10, 120, 120],              # fully off-image (all zeros)
        [30, 20, 2, 2],                    # tiny upscale
        [10, 5, 1, 1],                     # degenerate 1px
        [5, 7, 33.7, 33.7],                # fractional size
        [0, 0, W, H],                      # exact full image (non-square)
    ], np.float32)
    # integer-truncated offsets like pair_rois
    rois[:, :2] = np.trunc(rois[:, :2])
    _check(image, rois, 64, max_frac=0.02)


def test_prep_pallas_normalized_bf16_matches_einsum():
    """At the production dtype (bf16, normalized) the kernel must match
    the einsum HIGH path except rare tie pixels (1 uint8 LSB apart,
    then bf16-snapped)."""
    rng = np.random.RandomState(2)
    S, H, W, N = 2, 96, 128, 4
    images = rng.randint(0, 255, (S, H, W, 3)).astype(np.float32)
    masks = np.zeros((S, N, H, W), np.float32)
    bboxes = np.zeros((S, N, 4), np.float32)
    for s in range(S):
        for k in range(N):
            y0, x0 = rng.randint(0, H - 20), rng.randint(0, W - 20)
            hh, ww = rng.randint(5, 60, 2)
            masks[s, k, y0:y0 + hh, x0:x0 + ww] = 1
            bboxes[s, k] = [x0, y0, ww, hh]
    pidx, _ = P.all_pair_indices(N)
    rois = jax.vmap(lambda b: P.pair_rois(b, jnp.asarray(pidx)))(
        jnp.asarray(bboxes))
    high = np.concatenate([
        np.asarray(P.build_pair_batch_matmul(
            jnp.asarray(images[s]), jnp.asarray(masks[s]),
            jnp.asarray(pidx), rois[s], out_size=64,
            dtype=jnp.bfloat16)[..., 2:], np.float32)
        for s in range(S)], axis=0)
    got = fused_prep_rgb(jnp.asarray(images), rois, out_size=64,
                         interpret=True)
    got = np.transpose(np.asarray(got, np.float32), (0, 2, 3, 1))
    neq = got != high
    assert neq.mean() < 0.01, neq.mean()
    # a 1-uint8-LSB tie flip (<= 0.0228 normalized) snaps to the bf16
    # grid: normalized pixels lie in (-2.2, 2.7) where the grid step is
    # at most 2^-5, so differing pixels are at most one grid step apart
    assert np.abs(got - high).max() <= 0.03125 + 1e-6


def _scene_fixture(seed, S=2, H=96, W=128, N=4):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, (S, H, W, 3)).astype(np.float32)
    masks = np.zeros((S, N, H, W), np.float32)
    bboxes = np.zeros((S, N, 4), np.float32)
    for s in range(S):
        for k in range(N):
            y0, x0 = rng.randint(0, H - 20), rng.randint(0, W - 20)
            hh, ww = rng.randint(5, 60, 2)
            masks[s, k, y0:y0 + hh, x0:x0 + ww] = 1
            bboxes[s, k] = [x0, y0, ww, hh]
    pidx, _ = P.all_pair_indices(N)
    rois = jax.vmap(lambda b: P.pair_rois(b, jnp.asarray(pidx)))(
        jnp.asarray(bboxes))
    return images, masks, pidx, rois


def test_prep_pallas5_matches_einsum_path():
    """fused_prep_pairs (all 5 channels in-kernel) vs the per-scene
    einsum path: MASKS exact (one-hot nearest over {0,1} is exact in
    bf16), RGB at the tie bar."""
    images, masks, pidx, rois = _scene_fixture(4)
    S = images.shape[0]
    want = np.concatenate([
        np.asarray(P.build_pair_batch_matmul(
            jnp.asarray(images[s]), jnp.asarray(masks[s]),
            jnp.asarray(pidx), rois[s], out_size=64,
            dtype=jnp.bfloat16), np.float32)
        for s in range(S)], axis=0)
    got = np.asarray(P.build_pair_batches_fused(
        jnp.asarray(images), jnp.asarray(masks), jnp.asarray(pidx),
        rois, out_size=64, fuse_masks=True, interpret=True), np.float32)
    np.testing.assert_array_equal(got[..., :2], want[..., :2])
    d = np.abs(got[..., 2:] - want[..., 2:])
    assert d.max() <= 0.03125 + 1e-6, d.max()
    assert (d > 0).mean() < 0.01


def test_prep_pallas5_adversarial_rois():
    """Nearest windows (_half_window_nearest) must cover the worst-case
    geometry too: hand-built rois at the pair_rois size bound, hanging
    off every edge, tiny/fractional sizes — masks must stay EXACT."""
    rng = np.random.RandomState(5)
    H, W, N = 96, 128, 2
    images = rng.randint(0, 255, (1, H, W, 3)).astype(np.float32)
    masks = rng.randint(0, 2, (1, N, H, W)).astype(np.float32)
    szmax = float(np.trunc(max(np.sqrt(2.0 * H * W), 1.1 * max(H, W))))
    rois = np.array([[
        [0, 0, szmax, szmax],
        [-60, -40, szmax, szmax],
        [W - 10, H - 10, szmax, szmax],
        [-130, 10, 120, 120],
        [30, 20, 2, 2],
        [10, 5, 1, 1],
        [5, 7, 33.7, 33.7],
        [0, 0, W, H],
    ]], np.float32)
    rois[..., :2] = np.trunc(rois[..., :2])
    pidx = np.tile(np.array([[0, 1]], np.int32), (rois.shape[1], 1))
    want = np.asarray(P.build_pair_batch_matmul(
        jnp.asarray(images[0]), jnp.asarray(masks[0]), jnp.asarray(pidx),
        jnp.asarray(rois[0]), out_size=64, dtype=jnp.bfloat16),
        np.float32)
    got = np.asarray(P.build_pair_batches_fused(
        jnp.asarray(images), jnp.asarray(masks), jnp.asarray(pidx),
        jnp.asarray(rois), out_size=64, fuse_masks=True,
        interpret=True), np.float32)
    np.testing.assert_array_equal(got[..., :2], want[..., :2])
    d = np.abs(got[..., 2:] - want[..., 2:])
    assert d.max() <= 0.03125 + 1e-6, d.max()


def test_prep_pallas_one_pass_knob():
    """passes=1 (the --prep-precision 'default' serving knob) stays
    within a few uint8 LSB of the exact pixels."""
    rng = np.random.RandomState(3)
    H, W = 96, 128
    image = rng.randint(0, 255, (H, W, 3)).astype(np.float32)
    rois = np.array([[10, 5, 50, 50], [0, 0, W, H]], np.float32)
    got = fused_prep_rgb(jnp.asarray(image)[None], jnp.asarray(rois)[None],
                         out_size=64, normalize=False,
                         out_dtype=jnp.float32, passes=1, interpret=True)
    got = np.transpose(np.asarray(got, np.float32), (0, 2, 3, 1))
    want = _exact_rgb(image, rois, 64)
    assert np.abs(got - want).max() <= 4.0


def test_prep_pallas5_non8_multiple_dims():
    """Real COCO sizes are not 8-multiples (e.g. 427-wide). The
    build_pair_batches_fused wrapper zero-pads the source to the
    kernels' 8-multiple precondition — value-exact vs the einsum path
    on the ORIGINAL size, because out-of-image taps contribute zero
    there too (ops/pairs._interp_matrix's crop zero padding)."""
    images, masks, pidx, rois = _scene_fixture(7, S=2, H=91, W=107)
    S = images.shape[0]
    want = np.concatenate([
        np.asarray(P.build_pair_batch_matmul(
            jnp.asarray(images[s]), jnp.asarray(masks[s]),
            jnp.asarray(pidx), rois[s], out_size=64,
            dtype=jnp.bfloat16), np.float32)
        for s in range(S)], axis=0)
    got = np.asarray(P.build_pair_batches_fused(
        jnp.asarray(images), jnp.asarray(masks), jnp.asarray(pidx),
        rois, out_size=64, fuse_masks=True, interpret=True), np.float32)
    np.testing.assert_array_equal(got[..., :2], want[..., :2])
    d = np.abs(got[..., 2:] - want[..., 2:])
    assert d.max() <= 0.03125 + 1e-6, d.max()
    assert (d > 0).mean() < 0.01


def test_prep_pallas_chunked_matches_unchunked():
    """SMEM pair-cap chunking (ops/pairs._FUSED_PREP_PAIR_CAP): the
    fused prep kernels carry a 512 B/pair scalar-prefetch record, so
    >1620-pair calls are split and concatenated (3240 pairs exceeded
    the 1 MB SMEM budget on hardware). Chunked output must be
    BIT-identical to the single-call trace for both fused paths, in
    both chunking regimes (whole scenes, and the pair axis within one
    scene)."""
    images, masks, pidx, rois = _scene_fixture(11, S=4, N=4)
    args = (jnp.asarray(images), jnp.asarray(masks), jnp.asarray(pidx),
            rois)
    for fuse in (True, False):
        want = np.asarray(P.build_pair_batches_fused(
            *args, out_size=64, fuse_masks=fuse, interpret=True))
        # scene chunking: 4 scenes x 6 pairs, cap 12 -> 2 calls
        got_s = np.asarray(P.build_pair_batches_fused(
            *args, out_size=64, fuse_masks=fuse, interpret=True,
            pairs_per_call=12))
        # pair-axis chunking: cap 4 < P=6 -> per-scene pair splits
        got_p = np.asarray(P.build_pair_batches_fused(
            *args, out_size=64, fuse_masks=fuse, interpret=True,
            pairs_per_call=4))
        np.testing.assert_array_equal(got_s, want)
        np.testing.assert_array_equal(got_p, want)
