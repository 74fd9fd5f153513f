"""Loss parity vs torch criteria, including the reference's
activation-before-criterion quirks."""

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from instaorder_tpu import losses as L


def test_bce_matches_torch():
    rng = np.random.RandomState(0)
    p = rng.rand(8, 2).astype(np.float32)
    t = (rng.rand(8, 2) > 0.5).astype(np.float32)
    want = tnn.BCELoss()(torch.from_numpy(p), torch.from_numpy(t)).item()
    got = float(L.bce(p, t))
    assert abs(got - want) < 1e-6


def test_cross_entropy_on_softmax_quirk():
    """The reference feeds softmax outputs into nn.CrossEntropyLoss
    (supervised_order.py:54,86,400-419,468-487). Verify we reproduce the
    double-normalised value, not plain CE on logits."""
    rng = np.random.RandomState(1)
    logits = rng.randn(6, 3).astype(np.float32) * 3
    labels = rng.randint(0, 3, 6)
    sm = F.softmax(torch.from_numpy(logits), dim=1)
    want = tnn.CrossEntropyLoss()(sm, torch.from_numpy(labels)).item()
    got = float(L.cross_entropy(np.asarray(sm.numpy()), labels))
    assert abs(got - want) < 1e-6
    plain = tnn.CrossEntropyLoss()(torch.from_numpy(logits),
                                   torch.from_numpy(labels)).item()
    assert abs(want - plain) > 1e-3  # the quirk is material


def test_masked_cross_entropy_matches_boolean_indexing():
    rng = np.random.RandomState(2)
    probs = F.softmax(torch.from_numpy(rng.randn(10, 3).astype(np.float32)),
                      dim=1)
    labels = rng.randint(0, 3, 10)
    mask = rng.rand(10) > 0.4
    if mask.sum():
        want = tnn.CrossEntropyLoss()(probs[torch.from_numpy(mask)],
                                      torch.from_numpy(labels[mask])).item()
    else:
        want = 0.0
    got = float(L.cross_entropy_masked(probs.numpy(), labels, mask))
    assert abs(got - want) < 1e-6
    # empty mask -> exactly 0 (the reference's `if mask.sum() > 0` guard)
    assert float(L.cross_entropy_masked(probs.numpy(), labels,
                                        np.zeros(10, bool))) == 0.0


def test_label_swaps():
    d = np.array([0, 1, 2, 0])
    np.testing.assert_array_equal(np.asarray(L.swap_depth_labels(d)),
                                  [1, 0, 2, 1])
    o = np.array([0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(L.swap_ordernet_labels(o)),
                                  [1, 0, 2, 3])
    occ = np.array([[1.0, 0.0], [0.0, 1.0]])
    np.testing.assert_array_equal(np.asarray(L.swap_occ_columns(occ)),
                                  [[0, 1], [1, 0]])


def _torch_smooth_loss(disp, img):
    mn = disp.min(2, True)[0].min(3, True)[0]
    mx = disp.max(2, True)[0].max(3, True)[0]
    disp = (disp - mn) / (mx + 1e-7)
    mean_disp = disp.mean(2, True).mean(3, True)
    disp = disp / (mean_disp + 1e-7)
    gdx = torch.abs(disp[:, :, :, :-1] - disp[:, :, :, 1:])
    gdy = torch.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    gix = torch.mean(torch.abs(img[:, :, :, :-1] - img[:, :, :, 1:]), 1,
                     keepdim=True)
    giy = torch.mean(torch.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), 1,
                     keepdim=True)
    return (gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean()


def test_edge_aware_smoothness_matches_reference_math():
    rng = np.random.RandomState(3)
    disp = rng.rand(2, 1, 16, 16).astype(np.float32)
    img = rng.randn(2, 3, 16, 16).astype(np.float32)
    want = _torch_smooth_loss(torch.from_numpy(disp),
                              torch.from_numpy(img)).item()
    got = float(L.edge_aware_smoothness(
        disp[:, 0], img.transpose(0, 2, 3, 1)))
    assert abs(got - want) < 1e-5


def test_disparity_order_violations_matches_reference_loop():
    """Port check of supervised_order.py:157-179 against a direct loop."""
    rng = np.random.RandomState(4)
    N, H, W = 5, 12, 12
    disp1 = rng.rand(N, H, W).astype(np.float32)
    disp2 = rng.rand(N, H, W).astype(np.float32)
    m1 = np.zeros((N, H, W), bool)
    m2 = np.zeros((N, H, W), bool)
    for b in range(N):
        m1[b, 2:7, 2:7] = True
        m2[b, 5:11, 5:11] = True
    order = np.array([0, 1, 2, 0, 1])
    distinct = np.array([1, 1, 1, 0, 1], bool)

    want = 0
    for b in range(N):
        if not distinct[b]:
            continue
        d1, d2 = disp1[b], disp2[b]
        if order[b] == 0:
            want += (d1[m1[b]] <= d1[m2[b]].max()).sum()
            want += (d1[m1[b]].min() <= d1[m2[b]]).sum()
            want += (d2[m1[b]] >= d2[m2[b]].max()).sum()
            want += (d2[m1[b]].min() >= d2[m2[b]]).sum()
        elif order[b] == 1:
            want += (d1[m1[b]] >= d1[m2[b]].max()).sum()
            want += (d1[m1[b]].min() >= d1[m2[b]]).sum()
            want += (d2[m1[b]] <= d2[m2[b]].max()).sum()
            want += (d2[m1[b]].min() <= d2[m2[b]]).sum()

    got = float(L.disparity_order_violations(disp1, disp2, m1, m2, order,
                                             distinct))
    assert got == float(want)


def test_mask_weighted_cross_entropy_matches_torch():
    rng = np.random.RandomState(5)
    n, c, h, w = 2, 2, 8, 8
    logits = rng.randn(n, c, h, w).astype(np.float32)
    target = rng.randint(0, c, (n, h, w))
    mask = rng.rand(n, h, w) > 0.5

    pred = torch.from_numpy(logits).permute(0, 2, 3, 1).reshape(-1, c)
    tgt = torch.from_numpy(target).reshape(-1)
    msk = torch.from_numpy(mask).reshape(-1)
    li = F.cross_entropy(pred[msk], tgt[msk], reduction='sum')
    lo = F.cross_entropy(pred[~msk], tgt[~msk], reduction='sum')
    want = ((5.0 * li + 1.0 * lo) / (n * h * w)).item()

    got = float(L.mask_weighted_cross_entropy(
        logits.transpose(0, 2, 3, 1), target, mask))
    assert abs(got - want) < 1e-5


def test_bce_with_logits_value_matches_bce_on_sigmoid():
    rng = np.random.RandomState(6)
    o = rng.randn(8, 2).astype(np.float32) * 4
    t = (rng.rand(8, 2) > 0.5).astype(np.float32)
    want = tnn.BCELoss()(torch.sigmoid(torch.from_numpy(o)),
                         torch.from_numpy(t)).item()
    got = float(L.bce_with_logits(o, t))
    assert abs(got - want) < 1e-6
