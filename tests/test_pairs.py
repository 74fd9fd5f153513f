"""Fused pair-preprocessing parity vs the host cv2 reference path."""

import cv2
import numpy as np
import pytest

from instaorder_tpu.ops import pairs as P
from instaorder_tpu.utils import geometry as G


def host_reference_pair(image, m1, m2, b1, b2, sz):
    """The reference's patch-mode eval preprocessing (inference.py:449-464):
    union bbox -> square crop -> cv2 INTER_CUBIC rgb / INTER_NEAREST masks
    -> /255 imagenet normalize."""
    roi = G.pair_crop_bbox(b1, b2)
    rgb = cv2.resize(G.crop_padding(image, roi, (0, 0, 0)), (sz, sz),
                     interpolation=cv2.INTER_CUBIC)
    mi = cv2.resize(G.crop_padding(m1, roi, (0,)), (sz, sz),
                    interpolation=cv2.INTER_NEAREST)
    mj = cv2.resize(G.crop_padding(m2, roi, (0,)), (sz, sz),
                    interpolation=cv2.INTER_NEAREST)
    rgbn = (rgb.astype(np.float32) / 255.0 -
            P.IMAGENET_MEAN) / P.IMAGENET_STD
    return mi, mj, rgbn


def random_scene(seed, h=120, w=160, n=4):
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    masks = np.zeros((n, h, w), np.float32)
    bboxes = np.zeros((n, 4), np.float32)
    for k in range(n):
        y0 = rng.randint(0, h - 30)
        x0 = rng.randint(0, w - 30)
        hh = rng.randint(10, 30)
        ww = rng.randint(10, 30)
        masks[k, y0:y0 + hh, x0:x0 + ww] = 1
        bboxes[k] = [x0, y0, ww, hh]
    return image, masks, bboxes


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_patch_mode_matches_host_reference(seed):
    image, masks, bboxes, = random_scene(seed)
    pair_idx, valid = P.all_pair_indices(4)
    batch = np.asarray(P.build_pair_batch(image, masks, bboxes, pair_idx,
                                          out_size=64))
    for p, (i, j) in enumerate(pair_idx):
        mi, mj, rgbn = host_reference_pair(
            image.astype(np.uint8), masks[i], masks[j],
            bboxes[i], bboxes[j], 64)
        np.testing.assert_array_equal(batch[p, :, :, 0], mi)
        np.testing.assert_array_equal(batch[p, :, :, 1], mj)
        # cv2 resizes uint8 in 2^11 fixed point; we emulate the
        # saturate+round, leaving at most 1 uint8 LSB of difference
        # (1/255/std ~= 0.0175 after normalisation)
        diff = np.abs(batch[p, :, :, 2:] - rgbn)
        assert diff.max() <= 1.01 / 255.0 / P.IMAGENET_STD.min()
        assert (diff > 1e-6).mean() < 0.05  # and it is rare


def test_pair_rois_match_host_formula():
    _, _, bboxes = random_scene(7)
    import jax.numpy as jnp
    pair_idx, _ = P.all_pair_indices(4)
    rois = np.asarray(P.pair_rois(jnp.asarray(bboxes),
                                  jnp.asarray(pair_idx)))
    for p, (i, j) in enumerate(pair_idx):
        want = G.pair_crop_bbox(bboxes[i], bboxes[j])
        np.testing.assert_array_equal(rois[p].astype(int), want)


def test_all_pair_indices_padding():
    idx, valid = P.all_pair_indices(3, 8)
    assert idx.shape == (8, 2)
    assert valid.sum() == 3
    np.testing.assert_array_equal(idx[:3], [[0, 1], [0, 2], [1, 2]])
    idx0, valid0 = P.all_pair_indices(1, 4)
    assert valid0.sum() == 0


def test_shared_rgb_mode():
    image, masks, bboxes = random_scene(3)
    pair_idx, _ = P.all_pair_indices(4)
    out = np.asarray(P.build_pair_batch_shared_rgb(
        image, masks, pair_idx, out_size=64))
    assert out.shape == (6, 64, 64, 5)
    # masks must be the nearest-resized full-image masks
    want = cv2.resize(masks[0], (64, 64), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(out[0, :, :, 0], want)
    # rgb identical across pairs
    np.testing.assert_array_equal(out[0, :, :, 2:], out[5, :, :, 2:])


def test_matmul_prep_highest_precision_matches_gather_exactly():
    """With Precision.HIGHEST the MXU formulation must agree with the
    (exact) gather path bit-for-bit after the uint8 round."""
    import jax
    import jax.numpy as jnp
    from instaorder_tpu.ops.pairs import (build_pair_batch_matmul,
                                          build_pair_batch, pair_rois)
    image, masks, bboxes = random_scene(5)
    pair_idx, _ = P.all_pair_indices(4)
    rois = pair_rois(jnp.asarray(bboxes), jnp.asarray(pair_idx))
    got = np.asarray(build_pair_batch_matmul(
        image, masks, jnp.asarray(pair_idx), rois, out_size=64,
        precision=jax.lax.Precision.HIGHEST))
    want = np.asarray(build_pair_batch(image, masks, bboxes, pair_idx,
                                       out_size=64))
    np.testing.assert_array_equal(got[..., :2], want[..., :2])
    np.testing.assert_allclose(got[..., 2:], want[..., 2:], atol=1e-6)


def test_interp_matrix_direct_grid_equals_onehot_scatter():
    """_interp_matrix is built by direct grid evaluation; it must equal
    the definitional one-hot tap scatter BIT-FOR-BIT (same kernel
    expressions, Sterbenz-exact subtraction) — including crops that
    hang off the image and sub-pixel crop sizes."""
    import jax
    import jax.numpy as jnp

    def onehot_matrix(roi_off, roi_size, out_size, src_size, method):
        taps = P._cubic_taps if method == 'cubic' else P._linear_taps
        idx, w, valid = taps(roi_off, roi_size, out_size, src_size)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, src_size), 2)
        onehot = (idx[..., None] == iota).astype(jnp.float32)
        return jnp.sum(onehot * (w * valid)[..., None], axis=1)

    rng = np.random.RandomState(0)
    for method in ('cubic', 'linear'):
        for _ in range(20):
            off = float(rng.randint(-30, 100))        # trunc'd ints
            size = float(rng.uniform(1.0, 150.0))     # fractional ok
            got = np.asarray(P._interp_matrix(off, size, 32, 96, method))
            want = np.asarray(onehot_matrix(off, size, 32, 96, method))
            np.testing.assert_array_equal(got, want,
                                          err_msg=f'{method} {off} {size}')


def test_collectives_gather():
    import jax
    from instaorder_tpu.parallel import make_mesh, shard_batch
    from instaorder_tpu.parallel.collectives import (gather_tensors,
                                                     gather_tensors_batch,
                                                     process_allgather)
    mesh = make_mesh(8)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    sharded = shard_batch({'x': x}, mesh)['x']
    shards = gather_tensors(sharded)
    assert len(shards) == 8
    np.testing.assert_array_equal(gather_tensors_batch(sharded), x)
    np.testing.assert_array_equal(process_allgather(x), x)
