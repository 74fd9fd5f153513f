"""PCNet-M amodal/order inference flow tests (random net; flow + graph
semantics, not accuracy)."""

import numpy as np
import jax

from instaorder_tpu.models import unet
from instaorder_tpu.eval import amodal as A


def test_get_ancestors_bfs_with_cycle():
    # occlusion graph convention: graph[q, :] == -1 marks q's occluders
    g = np.zeros((4, 4), int)
    g[0, 1] = -1   # 1 occludes 0
    g[1, 2] = -1   # 2 occludes 1
    g[2, 1] = -1   # cycle 1 <-> 2
    anc = A.get_ancestors(g, 0)
    assert set(anc) == {1, 2}
    assert A.get_ancestors(g, 3).size == 0


def test_recover_mask_roundtrip():
    m = np.zeros((8, 8), np.uint8)
    m[2:6, 2:6] = 1
    # place the 8x8 patch (from bbox at (3,4) size 8) back into 20x30
    out = A.recover_mask(m, [3, 4, 8, 8], 20, 30, 'nearest')
    assert out.shape == (20, 30)
    assert out[6:10, 5:9].sum() == 16
    assert out.sum() == 16


def test_infer_order_and_amodal_flow():
    p, s, cfg = unet.init(jax.random.PRNGKey(0), in_channels=2, w=0.5,
                          n_classes=2, depth=2)
    comp = A.AmodalCompleter(unet.apply, cfg, p, s, input_size=32)
    inmodal = np.zeros((3, 48, 48), np.uint8)
    inmodal[0, 4:20, 4:20] = 1
    inmodal[1, 16:36, 8:28] = 1
    inmodal[2, 30:44, 30:44] = 1
    bboxes = np.array([[4, 4, 16, 16], [8, 16, 20, 20], [30, 30, 14, 14]])
    category = np.ones(3)
    image = np.zeros((48, 48, 3), np.uint8)
    order = comp.infer_order(image, inmodal, category, bboxes,
                             input_size=32)
    assert order.shape == (3, 3)
    patches = comp.infer_amodal(image, inmodal, category, bboxes,
                                order_matrix=-order, input_size=32)
    assert len(patches) == 3 and patches[0].shape == (32, 32)
    full = A.patch_to_fullimage(patches, bboxes, 48, 48, 'linear')
    assert full.shape == (3, 48, 48)


def test_densecrf_meanfield_edge_alignment():
    """ops/crf.densecrf (reference utils/common_utils.py:169-177): a
    noisy unary on a two-region image must snap toward the RGB edge."""
    from instaorder_tpu.ops.crf import densecrf

    h = w = 48
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, w // 2:] = [200, 40, 40]   # right half red, left black
    rng = np.random.RandomState(0)
    # unary: weakly prefers class 1 on the right, with heavy noise
    p1 = np.clip(0.5 + 0.15 * (np.arange(w) >= w // 2)[None, :]
                 + 0.25 * rng.randn(h, w), 0.02, 0.98)
    prob = np.stack([1 - p1, p1])
    refined = densecrf(prob, rgb, iters=1)
    assert refined.shape == (2, h, w)
    np.testing.assert_allclose(refined.sum(0), 1.0, atol=1e-6)
    pred_before = (prob[1] > 0.5)
    pred_after = (refined[1] > 0.5)
    gt = np.zeros((h, w), bool)
    gt[:, w // 2:] = True
    # one mean-field step (the reference's iter=1) must move the noisy
    # unary toward the color edge; the kernel widths (sxy=80) are tuned
    # for 256^2 patches, so demand improvement, not perfection, at 48^2
    assert (pred_after == gt).mean() > (pred_before == gt).mean() + 0.05


def test_infer_instseg_crf_branch():
    """infer_instseg with rgb: CRF-refined preds returned, right shapes
    (reference inference.py:825-857)."""
    p, s, cfg = unet.init(jax.random.PRNGKey(0), in_channels=2, w=0.5,
                          n_classes=2, depth=2)
    comp = A.AmodalCompleter(unet.apply, cfg, p, s, input_size=32)
    image = np.zeros((48, 48, 3), np.uint8)
    rgb = np.zeros((48, 48, 3), np.uint8)
    rgb[:, 24:] = [180, 60, 60]
    bboxes = np.array([[4, 4, 16, 16], [20, 20, 20, 20]])
    new_bboxes = np.array([[0, 0, 24, 24], [16, 16, 28, 28]])
    category = np.ones(2)
    preds = A.infer_instseg(comp, image, category, bboxes, new_bboxes,
                            input_size=32, th=0.5, rgb=rgb)
    assert len(preds) == 2
    assert all(pp.shape == (32, 32) and pp.dtype == np.uint8
               for pp in preds)
    # no-rgb branch still works
    preds2 = A.infer_instseg(comp, image, category, bboxes, new_bboxes,
                             input_size=32, th=0.5, rgb=None)
    assert len(preds2) == 2


def test_infer_amodal_hull_order_grounded():
    inmodal = np.zeros((2, 20, 20), np.uint8)
    inmodal[0, 2:10, 2:10] = 1
    inmodal[1, 8:16, 8:16] = 1
    order = np.zeros((2, 2), int)
    order[0, 1] = -1  # 1 occludes 0
    hulls = A.infer_amodal_hull(inmodal, None, order, order_grounded=True)
    # instance 0's hull may extend into 1's region but nowhere else
    extra = (hulls[0] == 1) & (inmodal[0] == 0)
    assert not (extra & (inmodal[1] == 0)).any()
