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
