"""cv2-parity harness for the on-device resize ops (SURVEY.md §7 hard part:
INTER_CUBIC/LINEAR/NEAREST exact match)."""

import cv2
import numpy as np
import pytest

from instaorder_tpu.ops.resize import (
    resize as _resize,
    resize_nearest,
)


class R:
    resize = staticmethod(_resize)
    resize_nearest = staticmethod(resize_nearest)


SIZES = [(480, 640, 256, 256), (123, 77, 256, 256), (384, 384, 100, 150),
         (32, 32, 384, 384)]


@pytest.mark.parametrize("h,w,oh,ow", SIZES)
def test_nearest_matches_cv2(h, w, oh, ow):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 2, (h, w), dtype=np.uint8)
    want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(R.resize_nearest(img, oh, ow))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("h,w,oh,ow", SIZES)
def test_linear_matches_cv2_float(h, w, oh, ow):
    rng = np.random.RandomState(1)
    img = rng.rand(h, w).astype(np.float32)
    want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(R.resize(img, oh, ow, 'linear'))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("h,w,oh,ow", SIZES)
def test_cubic_matches_cv2_float(h, w, oh, ow):
    rng = np.random.RandomState(2)
    img = rng.rand(h, w).astype(np.float32)
    want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(R.resize(img, oh, ow, 'cubic'))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_cubic_uint8_within_1lsb():
    """cv2's uint8 path uses 2^11 fixed point; float path may differ by 1."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (211, 173, 3), dtype=np.uint8)
    want = cv2.resize(img, (256, 256), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(R.resize(img.transpose(2, 0, 1).astype(np.float32),
                              256, 256, 'cubic')).transpose(1, 2, 0)
    got_u8 = np.clip(np.round(got), 0, 255).astype(np.int32)
    diff = np.abs(got_u8 - want.astype(np.int32))
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05


def test_batched_resize_shapes():
    img = np.random.rand(7, 5, 33, 44).astype(np.float32)
    out = R.resize(img, 64, 64, 'linear')
    assert out.shape == (7, 5, 64, 64)
    single = R.resize(img[3, 2], 64, 64, 'linear')
    np.testing.assert_allclose(np.asarray(out[3, 2]), np.asarray(single),
                               atol=1e-6)
