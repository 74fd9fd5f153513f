"""Pallas fused bottleneck: interpret-mode parity vs the XLA reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instaorder_tpu.ops.pallas_blocks import (fused_bottleneck,
                                              bottleneck_reference)


def make_block(seed, N=2, H=16, W=16, cin=256, cm=64):
    rng = np.random.RandomState(seed)
    x = rng.randn(N, H, W, cin).astype(np.float32)
    args = (rng.randn(cin, cm).astype(np.float32) * 0.05,
            rng.randn(cm).astype(np.float32) * 0.1,
            rng.randn(3, 3, cm, cm).astype(np.float32) * 0.05,
            rng.randn(cm).astype(np.float32) * 0.1,
            rng.randn(cm, cin).astype(np.float32) * 0.05,
            rng.randn(cin).astype(np.float32) * 0.1)
    return x, args


@pytest.mark.parametrize("batch_tile", [1, 2])
def test_fused_bottleneck_parity(batch_tile):
    x, args = make_block(0)
    want = np.asarray(bottleneck_reference(jnp.asarray(x),
                                           *map(jnp.asarray, args)))
    got = np.asarray(fused_bottleneck(jnp.asarray(x), *map(jnp.asarray,
                                                           args),
                                      interpret=True,
                                      batch_tile=batch_tile))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_bottleneck_border_behavior():
    """Zero padding at image borders must match the conv's zero padding
    (per image, no leakage between tile members)."""
    x, args = make_block(1, N=2, H=8, W=8, cin=128, cm=32)
    x[0] = 1.0
    x[1] = -1.0
    want = np.asarray(bottleneck_reference(jnp.asarray(x),
                                           *map(jnp.asarray, args)))
    got = np.asarray(fused_bottleneck(jnp.asarray(x), *map(jnp.asarray,
                                                           args),
                                      interpret=True, batch_tile=2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_folded_trunk_with_pallas_interpret_equivalence():
    """apply_folded(use_pallas) == apply_folded(xla) in interpret mode."""
    from instaorder_tpu.models import resnet
    from instaorder_tpu.models.folding import fold_resnet, apply_folded
    from instaorder_tpu.ops import pallas_blocks

    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(2, 1, 1, 1))
    folded = fold_resnet(params, stats, cfg)
    x = np.random.RandomState(0).randn(2, 64, 64, 5).astype(np.float32)
    want = np.asarray(apply_folded(folded, cfg, x))

    names = ('fused_bottleneck', 'fused_bottleneck_down', 'fused_stem',
             'fused_bottleneck_stage', 'fused_bottleneck_hwnc')
    origs = {n: getattr(pallas_blocks, n) for n in names}
    for n in names:
        setattr(pallas_blocks, n,
                (lambda o: lambda *a, **kw: o(*a, **dict(kw,
                                                         interpret=True)))(
                    origs[n]))
    try:
        got = np.asarray(apply_folded(folded, cfg, x, use_pallas=True))
        got_all = np.asarray(apply_folded(
            folded, cfg, x, use_pallas=('stage', 'down', 'stem')))
        got_hwnc = np.asarray(apply_folded(
            folded, cfg, x, use_pallas=('hwnc', 'down1')))
    finally:
        for n in names:
            setattr(pallas_blocks, n, origs[n])
    np.testing.assert_allclose(got, want, atol=2e-4)
    np.testing.assert_allclose(got_all, want, atol=2e-4)
    np.testing.assert_allclose(got_hwnc, want, atol=2e-4)


def test_fused_stage_parity():
    rng = np.random.RandomState(3)
    N, H, W, cin, cm, K = 2, 16, 16, 256, 64, 3
    x = rng.randn(N, H, W, cin).astype(np.float32)
    w1 = rng.randn(K, cin, cm).astype(np.float32) * 0.05
    b1 = rng.randn(K, cm).astype(np.float32) * 0.1
    w2 = rng.randn(K, 3, 3, cm, cm).astype(np.float32) * 0.05
    b2 = rng.randn(K, cm).astype(np.float32) * 0.1
    w3 = rng.randn(K, cm, cin).astype(np.float32) * 0.05
    b3 = rng.randn(K, cin).astype(np.float32) * 0.1
    want = jnp.asarray(x)
    for k in range(K):
        want = bottleneck_reference(want, w1[k], b1[k], w2[k], b2[k],
                                    w3[k], b3[k])
    from instaorder_tpu.ops.pallas_blocks import fused_bottleneck_stage
    got = fused_bottleneck_stage(jnp.asarray(x), *map(jnp.asarray,
                                                      (w1, b1, w2, b2, w3,
                                                       b3)),
                                 interpret=True, batch_tile=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_fused_stage_stream_parity():
    """Weight-streamed stage kernel (grid over blocks, activations
    resident in scratch) vs sequential XLA blocks — and vs the resident-
    stack stage kernel."""
    rng = np.random.RandomState(7)
    N, H, W, cin, cm, K = 4, 16, 16, 256, 64, 3
    x = rng.randn(N, H, W, cin).astype(np.float32)
    w1 = rng.randn(K, cin, cm).astype(np.float32) * 0.05
    b1 = rng.randn(K, cm).astype(np.float32) * 0.1
    w2 = rng.randn(K, 3, 3, cm, cm).astype(np.float32) * 0.05
    b2 = rng.randn(K, cm).astype(np.float32) * 0.1
    w3 = rng.randn(K, cm, cin).astype(np.float32) * 0.05
    b3 = rng.randn(K, cin).astype(np.float32) * 0.1
    want = jnp.asarray(x)
    for k in range(K):
        want = bottleneck_reference(want, w1[k], b1[k], w2[k], b2[k],
                                    w3[k], b3[k])
    from instaorder_tpu.ops.pallas_blocks import (
        fused_bottleneck_stage_stream)
    got = fused_bottleneck_stage_stream(
        jnp.asarray(x), *map(jnp.asarray, (w1, b1, w2, b2, w3, b3)),
        interpret=True, batch_tile=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_fused_stem_parity():
    from instaorder_tpu.ops.pallas_blocks import fused_stem, stem_reference
    rng = np.random.RandomState(4)
    x = rng.randn(2, 32, 32, 5).astype(np.float32)
    w = rng.randn(7, 7, 5, 64).astype(np.float32) * 0.05
    b = rng.randn(64).astype(np.float32) * 0.1
    want = np.asarray(stem_reference(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b)))
    got = np.asarray(fused_stem(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), interpret=True,
                                batch_tile=2))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize('stride,cin,cm,cout', [
    (1, 64, 64, 256),    # layer1[0]: channel projection, no spatial down
    (2, 256, 128, 512),  # layer2[0]
])
def test_fused_bottleneck_down_parity(stride, cin, cm, cout):
    from instaorder_tpu.ops.pallas_blocks import (
        fused_bottleneck_down, bottleneck_down_reference)
    rng = np.random.RandomState(0)
    H = 16
    x = rng.randn(4, H, H, cin).astype(np.float32)
    w = [rng.randn(cin, cm) * 0.1, rng.randn(cm),
         rng.randn(3, 3, cm, cm) * 0.1, rng.randn(cm),
         rng.randn(cm, cout) * 0.1, rng.randn(cout),
         rng.randn(cin, cout) * 0.1, rng.randn(cout)]
    w = [a.astype(np.float32) for a in w]
    got = np.asarray(fused_bottleneck_down(
        jnp.asarray(x), *map(jnp.asarray, w), stride=stride,
        interpret=True, batch_tile=2))
    want = np.asarray(bottleneck_down_reference(
        jnp.asarray(x), *map(jnp.asarray, w), stride=stride))
    assert got.shape == (4, H // stride, H // stride, cout)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize('stride,cin,cm,cout', [
    (1, 64, 64, 128),
    (2, 128, 64, 256),
])
def test_fused_bottleneck_down_int8_parity(stride, cin, cm, cout):
    """int8 projection kernel == the XLA int8 down-block math in
    models/quantize.py (bit-exact: same integer arithmetic)."""
    from instaorder_tpu.ops.pallas_blocks import fused_bottleneck_down_int8
    from instaorder_tpu.models import quantize as Q
    rng = np.random.RandomState(1)
    H = 8
    x8 = rng.randint(-127, 128, (2, H, H, cin)).astype(np.int8)
    def qw(ci, co):
        return (rng.randint(-127, 128, (ci, co)).astype(np.int8),
                (rng.rand(co).astype(np.float32) + 0.5) * 1e-3,
                rng.randn(co).astype(np.float32) * 0.1)
    w1, m1, b1 = qw(cin, cm)
    w2f = rng.randint(-127, 128, (3, 3, cm, cm)).astype(np.int8)
    _, m2, b2 = qw(cm, cm)
    w3, m3, b3 = qw(cm, cout)
    wd, md, bd = qw(cin, cout)

    got = np.asarray(fused_bottleneck_down_int8(
        jnp.asarray(x8), jnp.asarray(w1), jnp.asarray(m1), jnp.asarray(b1),
        jnp.asarray(w2f), jnp.asarray(m2), jnp.asarray(b2),
        jnp.asarray(w3), jnp.asarray(m3), jnp.asarray(b3),
        jnp.asarray(wd), jnp.asarray(md), jnp.asarray(bd),
        stride=stride, interpret=True, batch_tile=1))

    # XLA oracle: quantize.py's explicit down-block path
    qb = {'conv1': {'w': jnp.asarray(w1)[None, None], 'm': jnp.asarray(m1),
                    'b': jnp.asarray(b1)},
          'conv2': {'w': jnp.asarray(w2f), 'm': jnp.asarray(m2),
                    'b': jnp.asarray(b2)},
          'conv3': {'w': jnp.asarray(w3)[None, None], 'm': jnp.asarray(m3),
                    'b': jnp.asarray(b3)},
          'down': {'w': jnp.asarray(wd)[None, None], 'm': jnp.asarray(md),
                   'b': jnp.asarray(bd)}}
    h8 = jnp.asarray(x8)
    acc = Q._conv_int8(qb['conv1'], h8)
    a8 = Q._requant(acc, qb['conv1']['m'], qb['conv1']['b'])
    acc = Q._conv_int8(qb['conv2'], a8, stride=stride, padding=1)
    a8 = Q._requant(acc, qb['conv2']['m'], qb['conv2']['b'])
    acc3 = Q._conv_int8(qb['conv3'], a8)
    y = acc3.astype(jnp.float32) * qb['conv3']['m'] + qb['conv3']['b']
    accd = Q._conv_int8(qb['down'], h8, stride=stride)
    iden = accd.astype(jnp.float32) * qb['down']['m'] + qb['down']['b']
    want = np.asarray(jnp.clip(jnp.round(jnp.maximum(y + iden, 0.0)),
                               0, 127).astype(jnp.int8))
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_fused_stem_int8_parity():
    """int8 stem kernel == quantize.py's XLA int8 stem, bit-exact."""
    from instaorder_tpu.ops.pallas_blocks import fused_stem_int8
    from instaorder_tpu.models import quantize as Q
    rng = np.random.RandomState(5)
    x8 = rng.randint(-127, 128, (2, 32, 32, 5)).astype(np.int8)
    w8 = rng.randint(-127, 128, (7, 7, 5, 64)).astype(np.int8)
    m = (rng.rand(64).astype(np.float32) + 0.5) * 1e-3
    b = rng.randn(64).astype(np.float32) * 0.1
    q = {'conv1': {'w': jnp.asarray(w8), 'm': jnp.asarray(m),
                   'b': jnp.asarray(b)}}
    want = np.asarray(Q._stem_int8(q, jnp.asarray(x8)))
    got = np.asarray(fused_stem_int8(jnp.asarray(x8), jnp.asarray(w8),
                                     jnp.asarray(m), jnp.asarray(b),
                                     interpret=True, batch_tile=2))
    np.testing.assert_array_equal(got, want)


def test_i8v2_hwnc_pipeline_and_conv2_modes_bitexact():
    """pipeline=True reorders band emission only; every conv2 mode must
    carry the same math. im2col/acc/pipeline are bit-identical (same
    ops, different order/grouping); scatter modes reorder the f32 tap
    accumulation (and scatter16 rounds taps to bf16), so they may flip
    quantize-boundary round() ties by 1 LSB."""
    from instaorder_tpu.ops.pallas_blocks import fused_bottleneck_i8v2_hwnc
    rng = np.random.RandomState(0)
    H, W, N, Cin, Cm = 16, 16, 8, 64, 16
    x = jnp.asarray(rng.randint(0, 127, (H, W, N, Cin)), jnp.int8)
    w1 = jnp.asarray(rng.randn(Cin, Cm) * .1, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(Cm) * .1, jnp.float32)
    w2 = jnp.asarray(rng.randn(3, 3, Cm, Cm) * .1, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(Cm) * .1, jnp.float32)
    w3 = jnp.asarray(rng.randn(Cm, Cin) * .1, jnp.bfloat16)
    b3 = jnp.asarray(rng.randn(Cin) * .1, jnp.float32)

    def run(**kw):
        return np.asarray(fused_bottleneck_i8v2_hwnc(
            x, w1, b1, w2, b2, w3, b3, 0.5, interpret=True, bands=4,
            **kw)).astype(np.int32)

    base = run()
    np.testing.assert_array_equal(run(pipeline=True), base)
    np.testing.assert_array_equal(run(conv2_mode='acc'), base)
    np.testing.assert_array_equal(
        run(conv2_mode='acc', pipeline=True), base)
    # scatter: f32 reassociation only -> rare tie flips; scatter16
    # additionally rounds taps to bf16 -> a few % of 1-LSB flips
    for mode, frac in (('scatter', 0.01), ('scatter16', 0.05)):
        d = np.abs(run(conv2_mode=mode) - base)
        assert d.max() <= 1 and (d > 0).mean() < frac, (mode, d.max())
        d = np.abs(run(conv2_mode=mode, pipeline=True) - base)
        assert d.max() <= 1 and (d > 0).mean() < frac, (mode, d.max())
