"""Batched OrderPredictor vs a per-pair reference loop with the same
model — the batching must not change any decision."""

import numpy as np
import jax
import jax.numpy as jnp

from instaorder_tpu.models import resnet
from instaorder_tpu.eval.pipeline import OrderPredictor, bucket_pairs
from instaorder_tpu.eval import decode as D
from instaorder_tpu.ops.pairs import build_pair_batch, all_pair_indices


def scene(seed, n=4, h=96, w=128):
    rng = np.random.RandomState(seed)
    image = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    masks = np.zeros((n, h, w), np.float32)
    bboxes = np.zeros((n, 4), np.float32)
    for k in range(n):
        y0, x0 = rng.randint(0, h - 40), rng.randint(0, w - 40)
        hh, ww = rng.randint(15, 40), rng.randint(15, 40)
        masks[k, y0:y0 + hh, x0:x0 + ww] = 1
        bboxes[k] = [x0, y0, ww, hh]
    return image, masks, bboxes


def test_batched_occ_matches_per_pair_loop():
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(0)
    pred = OrderPredictor(resnet.apply, cfg, params, stats,
                          'InstaOrderNet_o', 'patch', input_size=64)
    got = pred.infer_occ_order(image, masks, bboxes)

    # per-pair loop with identical preprocessing + model
    n = masks.shape[0]
    want = np.zeros((n, n), int)
    for i in range(n):
        for j in range(i + 1, n):
            pi = np.array([[i, j]], np.int32)
            x1 = build_pair_batch(image, masks, bboxes, pi, out_size=64)
            x2 = x1[..., jnp.asarray([1, 0, 2, 3, 4])]
            o1, _ = resnet.apply(params, stats, cfg, x1, train=False)
            o2, _ = resnet.apply(params, stats, cfg, x2, train=False)
            ioj, joi = D.decode_occ(o1, o2)
            if bool(ioj[0]):
                want[i, j] = 1
            if bool(joi[0]):
                want[j, i] = 1
    np.testing.assert_array_equal(got, want)


def test_batched_od_joint():
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(1), arch='resnet50', in_channels=5,
        num_classes=[2, 3], layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(1)
    pred = OrderPredictor(resnet.apply, cfg, params, stats,
                          'InstaOrderNet_od', 'resize', input_size=64)
    occ, dep = pred.infer_occ_depth_order(image, masks, bboxes)
    assert occ.shape == (4, 4) and dep.shape == (4, 4)
    # depth matrix symmetry rules: [i,j]=1 -> [j,i]=0 ; 2 -> both 2
    for i in range(4):
        for j in range(i + 1, 4):
            if dep[i, j] == 2:
                assert dep[j, i] == 2
            else:
                assert {dep[i, j], dep[j, i]} == {0, 1}


def test_nbor_pair_filter():
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(2), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image = np.zeros((64, 64, 3), np.float32)
    masks = np.zeros((3, 64, 64), np.float32)
    masks[0, 2:20, 2:20] = 1
    masks[1, 19:40, 2:20] = 1   # touches 0
    masks[2, 50:60, 50:60] = 1  # isolated
    bboxes = np.array([[2, 2, 18, 18], [2, 19, 18, 21], [50, 50, 10, 10]],
                      np.float32)
    pred = OrderPredictor(resnet.apply, cfg, params, stats,
                          'InstaOrderNet_o', 'patch', input_size=64)
    got = pred.infer_occ_order(image, masks, bboxes, pairs='nbor')
    # isolated instance 2 must have an all-zero row & column
    assert got[2].sum() == 0 and got[:, 2].sum() == 0


def test_bucket_sizes():
    assert bucket_pairs(1) == 8
    assert bucket_pairs(9) == 16
    assert bucket_pairs(1025) == 2048


def test_orig_mode():
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(3), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(2, h=100, w=130)
    pred = OrderPredictor(resnet.apply, cfg, params, stats,
                          'InstaOrderNet_o', 'orig', input_size=None)
    got = pred.infer_occ_order(image, masks, bboxes)
    assert got.shape == (4, 4)


def test_valid_hw_padded_forward_equals_exact():
    """resnet.apply(valid_hw): zero-padding to a bucket + the static
    valid region must reproduce the exact-size logits (the masked pad
    region behaves exactly like the convs' implicit zero padding)."""
    for arch in ('resnet50', 'resnet18'):
        params, stats, cfg = resnet.init(
            jax.random.PRNGKey(11), arch=arch, in_channels=5,
            num_classes=2, layers_override=(1, 1, 1, 1))
        x = np.random.RandomState(0).randn(2, 64, 96, 5).astype(np.float32)
        want, _ = resnet.apply(params, stats, cfg, jnp.asarray(x),
                               train=False)
        xp = np.zeros((2, 128, 128, 5), np.float32)
        xp[:, :64, :96] = x
        got, _ = resnet.apply(params, stats, cfg, jnp.asarray(xp),
                              train=False, valid_hw=(64, 96))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=arch)


def test_orig_mode_bucketed_compile_reuse():
    """Two images whose x32-rounded sizes differ must reuse ONE compiled
    forward (padded to the shared (128, 128) bucket) and produce the
    same matrices as the exact-size (per-size-compile) fallback
    (VERDICT r2 item 5; reference inference.py:401-408)."""
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(3), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    pred = OrderPredictor(resnet.apply, cfg, params, stats,
                          'InstaOrderNet_o', 'orig', input_size=None)
    assert pred._takes_valid_hw

    # exact-size fallback: an apply_fn without valid_hw support
    def apply_no_vhw(p, s, c, x, train=False):
        return resnet.apply(p, s, c, x, train=train)
    pred_exact = OrderPredictor(apply_no_vhw, cfg, params, stats,
                                'InstaOrderNet_o', 'orig', input_size=None)
    assert not pred_exact._takes_valid_hw

    scenes = [scene(2, h=100, w=130),   # -> (96, 128)
              scene(5, h=60, w=100)]    # -> (64, 96)
    for image, masks, bboxes in scenes:
        got = pred.infer_occ_order(image, masks, bboxes)
        want = pred_exact.infer_occ_order(image, masks, bboxes)
        np.testing.assert_array_equal(got, want)
    assert pred._forward._cache_size() == 1, pred._forward._cache_size()
    assert pred_exact._forward._cache_size() == 2


def test_pair_sharded_predictor_matches_single():
    """OrderPredictor with a data mesh: pair-sharded forward must produce
    identical matrices."""
    from instaorder_tpu.parallel import make_mesh
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(9), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(4)
    single = OrderPredictor(resnet.apply, cfg, params, stats,
                            'InstaOrderNet_o', 'patch', input_size=64)
    sharded = OrderPredictor(resnet.apply, cfg, params, stats,
                             'InstaOrderNet_o', 'patch', input_size=64,
                             mesh=make_mesh(8))
    m1 = single.infer_occ_order(image, masks, bboxes)
    m2 = sharded.infer_occ_order(image, masks, bboxes)
    np.testing.assert_array_equal(m1, m2)


def test_folded_predictor_matches_stock_f32():
    from instaorder_tpu.eval.pipeline import make_folded_predictor
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(11), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(6)
    stock = OrderPredictor(resnet.apply, cfg, params, stats,
                           'InstaOrderNet_o', 'patch', input_size=64)
    fast = make_folded_predictor(params, stats, cfg, 'InstaOrderNet_o',
                                 patch_or_image='patch', input_size=64)
    m1 = stock.infer_occ_order(image, masks, bboxes)
    m2 = fast.infer_occ_order(image, masks, bboxes)
    np.testing.assert_array_equal(m1, m2)


def test_disparity_order_predictor_gradient():
    """A disparity decreasing with y: higher masks are closer."""
    from instaorder_tpu.eval.pipeline import DisparityOrderPredictor

    def fwd(x):
        h = w = x.shape[1]
        gy = np.linspace(1.0, 0.1, h, dtype=np.float32)
        return np.tile(gy[None, :, None], (x.shape[0], 1, w))

    pred = DisparityOrderPredictor(fwd, 'median', input_size=64)
    image = np.zeros((100, 100, 3), np.float32)
    masks = np.zeros((2, 100, 100), np.float32)
    masks[0, 5:25, 10:60] = 1    # top -> larger disp -> closer
    masks[1, 70:95, 10:60] = 1   # bottom -> farther
    m = pred.infer_depth_order(image, masks)
    assert m[0, 1] == 1 and m[1, 0] == 0  # 0 closer than 1


def test_disparity_predictor_return_disp():
    """return_disp yields the [q05, q95]-clipped disparity (reference
    infer_order_sup_depth second return, inference.py:588,624)."""
    from instaorder_tpu.eval.pipeline import DisparityOrderPredictor

    def fwd(x):
        h = w = x.shape[1]
        gy = np.linspace(1.0, 0.1, h, dtype=np.float32)
        return np.tile(gy[None, :, None], (x.shape[0], 1, w))

    pred = DisparityOrderPredictor(fwd, 'median', input_size=64)
    image = np.zeros((100, 100, 3), np.float32)
    masks = np.zeros((2, 100, 100), np.float32)
    masks[0, 5:25, 10:60] = 1
    masks[1, 70:95, 10:60] = 1
    m, disp = pred.infer_depth_order(image, masks, return_disp=True)
    m2 = pred.infer_depth_order(image, masks)
    np.testing.assert_array_equal(m, m2)
    assert disp.shape == (64, 64)
    raw = fwd(np.zeros((1, 64, 64, 3)))[0]
    lo, hi = np.quantile(raw, 0.05), np.quantile(raw, 0.95)
    np.testing.assert_allclose(disp, np.clip(raw, lo, hi), atol=1e-6)


def test_int8_predictor_agrees_with_f32():
    """make_int8_predictor: PTQ-quantized serving predictor decisions
    match the f32 predictor on the synthetic scene (small logits can
    flip near the 0.5 threshold; require >= 90% matrix agreement)."""
    from instaorder_tpu.eval.pipeline import (make_folded_predictor,
                                              make_int8_predictor)
    from instaorder_tpu.ops.pairs import (all_pair_indices,
                                          build_pair_batch)
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(13), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(6)
    pair_idx, _ = all_pair_indices(6)
    calib = np.asarray(build_pair_batch(image, masks, bboxes,
                                        jnp.asarray(pair_idx),
                                        out_size=64, rgb_method='cubic'),
                       np.float32)
    f32 = make_folded_predictor(params, stats, cfg, 'InstaOrderNet_o',
                                patch_or_image='patch', input_size=64)
    q = make_int8_predictor(params, stats, cfg, 'InstaOrderNet_o',
                            [calib], use_pallas=False,
                            patch_or_image='patch', input_size=64)
    m1 = f32.infer_occ_order(image, masks, bboxes)
    m2 = q.infer_occ_order(image, masks, bboxes)
    assert (m1 == m2).mean() >= 0.9, (m1, m2)


def test_v2_predictor_agrees_with_f32():
    """make_v2_predictor (boundary-int8 storage, float compute): matrix
    agreement vs the f32 predictor — strictly less quantization noise
    than the fully-int8 predictor, so hold it to a tighter bar."""
    from instaorder_tpu.eval.pipeline import (make_folded_predictor,
                                              make_v2_predictor)
    from instaorder_tpu.ops.pairs import (all_pair_indices,
                                          build_pair_batch)
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(13), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(6)
    pair_idx, _ = all_pair_indices(6)
    calib = np.asarray(build_pair_batch(image, masks, bboxes,
                                        jnp.asarray(pair_idx),
                                        out_size=64, rgb_method='cubic'),
                       np.float32)
    f32 = make_folded_predictor(params, stats, cfg, 'InstaOrderNet_o',
                                patch_or_image='patch', input_size=64)
    q = make_v2_predictor(params, stats, cfg, 'InstaOrderNet_o',
                          [calib], use_pallas=False,
                          compute_dtype=jnp.float32,
                          patch_or_image='patch', input_size=64)
    m1 = f32.infer_occ_order(image, masks, bboxes)
    m2 = q.infer_occ_order(image, masks, bboxes)
    assert (m1 == m2).mean() >= 0.95, (m1, m2)


def test_single_direction_mode():
    """OrderPredictor(directions=1): one forward per pair (serving speed
    knob). On the layered synthetic scene (clear margins) the decisions
    should overwhelmingly agree with the reference-parity 2-direction
    ensemble."""
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(21), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(6, n=6)
    two = OrderPredictor(resnet.apply, cfg, params, stats,
                         'InstaOrderNet_o', 'patch', input_size=64)
    one = OrderPredictor(resnet.apply, cfg, params, stats,
                         'InstaOrderNet_o', 'patch', input_size=64,
                         directions=1)
    m2 = two.infer_occ_order(image, masks, bboxes)
    m1 = one.infer_occ_order(image, masks, bboxes)
    assert m1.shape == m2.shape == (6, 6)
    assert (m1 == m2).mean() >= 0.8, (m1, m2)


def test_single_direction_decode_rules():
    """out2=None decode == using pass-1 probabilities alone."""
    from instaorder_tpu.eval import decode as D
    rng = np.random.RandomState(3)
    o1 = jnp.asarray(rng.randn(8, 2).astype(np.float32) * 3)
    i1, j1 = D.decode_occ(o1, None)
    s1 = np.asarray(jax.nn.sigmoid(o1))
    np.testing.assert_array_equal(np.asarray(i1), s1[:, 1] > 0.5)
    np.testing.assert_array_equal(np.asarray(j1), s1[:, 0] > 0.5)
    d1 = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 3)
    arg = np.asarray(D.decode_depth(d1, None))
    np.testing.assert_array_equal(arg, np.argmax(np.asarray(d1), axis=1))


def test_weight_permuted_siamese_matches_swapped_input():
    """The Tester's conv1-weight-permuted siamese_fn must produce the
    same order matrices as the generic swapped-input-concat path (the
    mask channels enter the net only through conv1)."""
    from instaorder_tpu.models import resnet
    from instaorder_tpu.eval.pipeline import OrderPredictor
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(7), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(5)

    def siamese_fn(p, s, c, x):
        cin = p['conv1']['w'].shape[2]
        perm = [1, 0] + list(range(2, cin))
        p2 = dict(p, conv1=dict(p['conv1'],
                                w=p['conv1']['w'][:, :, perm, :]))
        o1, _ = resnet.apply(p, s, c, x, train=False)
        o2, _ = resnet.apply(p2, s, c, x, train=False)
        return o1, o2

    base = OrderPredictor(resnet.apply, cfg, params, stats,
                          'InstaOrderNet_o', patch_or_image='patch',
                          input_size=64)
    fold = OrderPredictor(resnet.apply, cfg, params, stats,
                          'InstaOrderNet_o', patch_or_image='patch',
                          input_size=64, siamese_fn=siamese_fn)
    m1 = np.asarray(base.infer_occ_order(image, masks, bboxes))
    m2 = np.asarray(fold.infer_occ_order(image, masks, bboxes))
    np.testing.assert_array_equal(m1, m2)


def test_pallas5_prep_predictor_matches_einsum():
    """OrderPredictor(prep_impl='pallas5'): the whole 5-channel pair
    prep as one pallas kernel (serving knob). Masks must be bit-exact
    vs the einsum predictor's batch and RGB within the documented
    1-LSB tie bar — on a NON-8-multiple image (the wrapper's zero-pad
    path), since that is what real COCO sizes hit."""
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(2), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    image, masks, bboxes = scene(5, h=93, w=121)
    kw = dict(patch_or_image='patch', input_size=64)
    base = OrderPredictor(resnet.apply, cfg, params, stats,
                          'InstaOrderNet_o', **kw)
    fused = OrderPredictor(resnet.apply, cfg, params, stats,
                           'InstaOrderNet_o', prep_impl='pallas5',
                           prep_interpret=True, **kw)
    pidx, _ = all_pair_indices(masks.shape[0])
    args = (jnp.asarray(image, jnp.float32), jnp.asarray(masks),
            jnp.asarray(bboxes, jnp.float32), jnp.asarray(pidx))
    x_base, _ = base._build_batch(*args)
    x_fused, _ = fused._build_batch(*args)
    xb = np.asarray(x_base, np.float32)
    xf = np.asarray(x_fused, np.float32)
    np.testing.assert_array_equal(xf[..., :2], xb[..., :2])
    # einsum path is f32 cv2-exact; fused is bf16 serving precision:
    # bf16 cast (<=2^-8 rel) + rare 1-LSB rounding ties (<= one bf16
    # grid step, 0.03125 on the normalized range)
    d = np.abs(xf[..., 2:] - xb[..., 2:])
    assert d.max() <= 0.03125 + 1e-6, d.max()
    # and the decision surface agrees end-to-end on this fixture
    np.testing.assert_array_equal(
        fused.infer_occ_order(image, masks, bboxes),
        base.infer_occ_order(image, masks, bboxes))
