"""Decode rules + metrics parity (sklearn, reference conventions)."""

import numpy as np
import pytest

from instaorder_tpu.eval import decode as D
from instaorder_tpu.eval import metrics as M


def sigmoid(x):
    return 1 / (1 + np.exp(-x))


def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_decode_occ_matches_reference_rule():
    rng = np.random.RandomState(0)
    o1 = rng.randn(10, 2).astype(np.float32)
    o2 = rng.randn(10, 2).astype(np.float32)
    i_over_j, j_over_i = D.decode_occ(o1, o2)
    s1, s2 = sigmoid(o1), sigmoid(o2)
    want_ij = (s1[:, 1] + s2[:, 0]) / 2 > 0.5
    want_ji = (s1[:, 0] + s2[:, 1]) / 2 > 0.5
    np.testing.assert_array_equal(np.asarray(i_over_j), want_ij)
    np.testing.assert_array_equal(np.asarray(j_over_i), want_ji)


@pytest.mark.parametrize("ncls", [3, 4])
def test_decode_ordernet(ncls):
    rng = np.random.RandomState(1)
    o1 = rng.randn(20, ncls).astype(np.float32) * 2
    o2 = rng.randn(20, ncls).astype(np.float32) * 2
    i_over_j, j_over_i = D.decode_ordernet(o1, o2)
    s1, s2 = softmax(o1), softmax(o2)
    for k in range(20):
        p12 = (s1[k, 1] + s2[k, 0]) / 2
        p21 = (s1[k, 0] + s2[k, 1]) / 2
        pno = (s1[k, 2] + s2[k, 2]) / 2
        pbo = (s1[k, 3] + s2[k, 3]) / 2 if ncls == 4 else 0.0
        arg = int(np.argmax([p12, p21, pno, pbo]))
        want = {0: (True, False), 1: (False, True), 2: (False, False),
                3: (True, True)}[arg]
        assert (bool(i_over_j[k]), bool(j_over_i[k])) == want


def test_depth_matrix_assembly():
    import jax.numpy as jnp
    pair_idx = np.array([[0, 1], [0, 2], [1, 2]], np.int32)
    arg = np.array([0, 1, 2])    # 0 closer, 1 farther, 2 equal
    valid = np.array([True, True, True])
    m = np.asarray(D.depth_matrix(3, jnp.asarray(pair_idx),
                                  jnp.asarray(arg), jnp.asarray(valid)))
    want = np.array([[0, 1, 0],
                     [0, 0, 2],
                     [1, 2, 0]])
    np.testing.assert_array_equal(m, want)


def test_occ_matrix_assembly_with_padding():
    import jax.numpy as jnp
    pair_idx = np.array([[0, 1], [1, 2], [0, 0]], np.int32)  # last = pad
    i_over_j = np.array([True, False, True])
    j_over_i = np.array([True, True, True])
    valid = np.array([True, True, False])
    m = np.asarray(D.occ_matrix(3, jnp.asarray(pair_idx),
                                jnp.asarray(i_over_j),
                                jnp.asarray(j_over_i), jnp.asarray(valid)))
    want = np.array([[0, 1, 0],
                     [1, 0, 0],
                     [0, 1, 0]])
    np.testing.assert_array_equal(m, want)


def test_rpf1_matches_sklearn():
    from sklearn.metrics import recall_score, precision_score, f1_score
    rng = np.random.RandomState(2)
    for trial in range(10):
        gt = rng.randint(-1, 2, (6, 6))
        pred = rng.randint(0, 2, (6, 6))
        keep = gt != -1
        g, p = gt[keep].reshape(-1), pred[keep].reshape(-1)
        want = (recall_score(g, p, average='binary', zero_division=0) * 100,
                precision_score(g, p, average='binary',
                                zero_division=0) * 100,
                f1_score(g, p, average='binary', zero_division=0) * 100)
        got = M.eval_order_recall_precision_f1(pred, gt, zd=0)
        np.testing.assert_allclose(got, want, atol=1e-9)


def test_whdr_slices():
    n = 4
    gt = -np.ones((n, n), int)
    ovl = -np.ones((n, n), int)
    cnt = -np.ones((n, n), int)
    # pair (0,1): distinct, order 1, count 2 ; pair (0,2): overlap, eq,
    # count 4 ; pair (1,2): distinct, eq, count 2
    gt[0, 1], gt[1, 0], ovl[0, 1], ovl[1, 0], cnt[0, 1], cnt[1, 0] = \
        1, 0, 0, 0, 2, 2
    gt[0, 2], gt[2, 0], ovl[0, 2], ovl[2, 0], cnt[0, 2], cnt[2, 0] = \
        2, 2, 1, 1, 4, 4
    gt[1, 2], gt[2, 1], ovl[1, 2], ovl[2, 1], cnt[1, 2], cnt[2, 1] = \
        2, 2, 0, 0, 2, 2
    pred = np.zeros((n, n), int)
    pred[0, 1] = 1          # correct
    pred[0, 2] = 1          # wrong (gt eq)
    pred[1, 2] = 2          # correct
    out = M.eval_depth_order_whdr(pred, [gt, ovl, cnt])
    # ovlX (pairs 01, 12): both correct -> 0
    assert out['ovlX_all'][0] == 0
    # ovlO (pair 02): wrong -> 100
    assert out['ovlO_all'][0] == 100
    # ovlOX all: weights 1, 0.5, 1 ; errors: pair02 (w 0.5) -> 20%
    assert abs(out['ovlOX_all'][0] - 0.5 / 2.5 * 100) < 1e-9
    # empty slice -> -1
    assert out['ovlO_neq'][0] == -1


def test_eval_order_counts():
    gt = np.array([[0, 1], [0, 0]])
    pred = np.array([[0, 1], [1, 0]])
    apt, ap, opt_, op, err = M.eval_order(pred, gt)
    assert ap == 1 and op == 0.5
    assert apt == 0.5  # one mismatched off-diagonal cell pair-half
    assert opt_ == 0.5


def test_dense_depth_metrics_sanity():
    gt = np.linspace(1, 10, 100)
    out = M.compute_errors(gt, gt)
    assert out['abs_rel'] == 0 and out['rmse'] == 0 and out['d1'] == 1
    s, t = M.compute_scale_and_shift(gt * 2 + 1, gt, np.ones_like(gt))
    np.testing.assert_allclose([s, t], [0.5, -0.5], atol=1e-9)


def test_heuristics_shapes():
    from instaorder_tpu.eval import heuristics as H
    masks = np.zeros((3, 32, 32), np.uint8)
    masks[0, 2:12, 2:12] = 1
    masks[1, 10:20, 2:12] = 1   # borders 0
    masks[2, 24:30, 24:30] = 1  # isolated
    amodal = masks.copy()
    amodal[0, 2:14, 2:12] = 1   # amodal of 0 extends under 1
    occ = H.infer_occ_order_area(masks)
    assert occ.shape == (3, 3) and occ[2].sum() == 0
    d = H.infer_depth_order_yaxis(masks)
    assert d.shape == (3, 3)
    gt = H.infer_gt_order(masks, amodal)
    assert gt[1, 0] == 1 and gt[0, 1] == 0  # 1's modal covered by 0's amodal
    hull = H.infer_order_hull(masks)
    assert hull.shape == (3, 3)
