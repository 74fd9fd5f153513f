import cv2
import numpy as np
from scipy import ndimage

from instaorder_tpu.ops import morphology as M


def blob(h, w, seed):
    rng = np.random.RandomState(seed)
    from scipy.ndimage import gaussian_filter
    return (gaussian_filter(rng.rand(h, w), 2) > 0.5).astype(np.uint8)


def test_erosion_matches_scipy():
    for seed in range(4):
        m = blob(40, 56, seed)
        want = ndimage.binary_erosion(m)  # default cross structure
        got = np.asarray(M.binary_erosion(m))
        np.testing.assert_array_equal(got, want)


def test_erosion_batched():
    ms = np.stack([blob(24, 24, s) for s in range(3)])
    got = np.asarray(M.binary_erosion(ms))
    for i in range(3):
        np.testing.assert_array_equal(got[i], ndimage.binary_erosion(ms[i]))


def test_dilation_matches_cv2_cross():
    kernel = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8)
    for seed in range(4):
        m = blob(33, 47, seed + 10)
        want = cv2.dilate(m, kernel, iterations=1).astype(bool)
        got = np.asarray(M.binary_dilation(m))
        np.testing.assert_array_equal(got, want)


def test_bordering_matrix_matches_reference_def():
    kernel = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], dtype=np.uint8)

    def bordering_ref(a, b):
        return bool(np.any((cv2.dilate(a, kernel, iterations=1) == 1) & b))

    masks = np.zeros((4, 20, 20), dtype=np.uint8)
    masks[0, 2:8, 2:8] = 1
    masks[1, 8:12, 2:8] = 1   # touches 0 at row 8
    masks[2, 14:18, 14:18] = 1  # isolated
    masks[3, 4:6, 4:6] = 1    # inside 0 (overlaps)
    got = np.asarray(M.bordering_matrix(masks))
    for i in range(4):
        for j in range(4):
            if i == j:
                assert not got[i, j]
            else:
                assert got[i, j] == bordering_ref(masks[i], masks[j])
