import numpy as np
import pytest

from instaorder_tpu.utils import geometry as G


def test_combine_bbox():
    boxes = np.array([[10, 20, 30, 40], [5, 50, 10, 20]])
    out = G.combine_bbox(boxes)
    # left=5, top=20, right=max(40,15)=40, bottom=max(60,70)=70
    assert out.tolist() == [5, 20, 35, 50]


def test_mask_to_bbox():
    m = np.zeros((10, 12), dtype=np.uint8)
    assert G.mask_to_bbox(m) == [0, 0, 0, 0]
    m[3:7, 2:9] = 1
    assert G.mask_to_bbox(m) == [2, 3, 7, 4]


def test_bbox_iou():
    assert G.bbox_iou((0, 0, 10, 10), (20, 20, 30, 30)) == 0.0
    assert G.bbox_iou((0, 0, 10, 10), (0, 0, 10, 10)) == pytest.approx(1.0)
    # half overlap
    v = G.bbox_iou((0, 0, 10, 10), (5, 0, 15, 10))
    assert v == pytest.approx(50 / 150)


def test_crop_padding_in_bounds():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    out = G.crop_padding(img, (1, 1, 3, 2), pad_value=(0,))
    np.testing.assert_array_equal(out, img[1:3, 1:4])


def test_crop_padding_out_of_bounds():
    img = np.ones((4, 4), dtype=np.uint8) * 7
    out = G.crop_padding(img, (-2, -2, 5, 5), pad_value=(0,))
    assert out.shape == (5, 5)
    assert out[0, 0] == 0 and out[2, 2] == 7
    np.testing.assert_array_equal(out[2:5, 2:5], img[0:3, 0:3])
    # fully outside -> all pad
    out = G.crop_padding(img, (10, 10, 3, 3), pad_value=(9,))
    assert (out == 9).all()


def test_crop_padding_multichannel():
    img = np.random.randint(0, 255, (6, 6, 3), dtype=np.uint8)
    out = G.crop_padding(img, (2, 2, 8, 8), pad_value=(1, 2, 3))
    np.testing.assert_array_equal(out[:4, :4], img[2:, 2:])
    np.testing.assert_array_equal(out[5, 5], [1, 2, 3])


def test_pair_crop_bbox_matches_reference_formula():
    b1, b2 = [10, 10, 20, 30], [40, 20, 10, 10]
    roi = G.pair_crop_bbox(b1, b2)
    union = G.combine_bbox(np.array([b1, b2]))
    size = max(np.sqrt(union[2] * union[3] * 2.0),
               union[2] * 1.1, union[3] * 1.1)
    cx, cy = union[0] + union[2] / 2, union[1] + union[3] / 2
    assert roi == [int(cx - size / 2), int(cy - size / 2), int(size), int(size)]


def test_place_eraser_ratio_bounds():
    rng = np.random.RandomState(0)
    inst = np.zeros((32, 32), dtype=np.uint8)
    inst[8:24, 8:24] = 1
    eraser = np.zeros((32, 32), dtype=np.uint8)
    eraser[4:28, 4:28] = 1
    shifted, ratio = G.place_eraser(inst, eraser, 0.4, 1.0, rng)
    assert shifted.shape == inst.shape
    assert 0.0 <= ratio <= 1.0


def test_scissor_mask_erases():
    rng = np.random.RandomState(1)
    inst = np.ones((16, 16), dtype=np.float32)
    eraser = np.ones((16, 16), dtype=np.float32)
    erased, shifted, ratio = G.scissor_mask(inst, eraser, 0.2, 0.6, rng)
    assert (erased[shifted] == 0).all()
    assert ratio == pytest.approx(shifted.mean(), abs=1e-6)


def test_get_closest_int_multiple_of():
    assert G.get_closest_int_multiple_of(384, 32) == 384
    assert G.get_closest_int_multiple_of(400, 32) == 416
    assert G.get_closest_int_multiple_of(390, 32) == 384
    assert G.get_closest_int_multiple_of(399, 32) == 384  # 399%32=15 < 16
