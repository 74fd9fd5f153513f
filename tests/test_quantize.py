"""int8 PTQ serving path: calibration, quantized-vs-f32 closeness, exact
Pallas/XLA agreement, siamese swap-fold correctness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instaorder_tpu.models import resnet
from instaorder_tpu.models.folding import fold_resnet, apply_folded
from instaorder_tpu.models import quantize as Q


@pytest.fixture(scope='module')
def small_net():
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(2, 2, 1, 1))
    folded = fold_resnet(params, stats, cfg)
    rng = np.random.RandomState(0)
    xs = [rng.randn(2, 64, 64, 5).astype(np.float32) for _ in range(2)]
    scales = Q.calibrate_folded_resnet(folded, cfg, xs)
    q = Q.quantize_folded_resnet(folded, cfg, scales)
    return folded, cfg, q, xs


def test_int8_close_to_f32_and_decisions_agree(small_net):
    folded, cfg, q, xs = small_net
    x = xs[0]
    want = np.asarray(apply_folded(folded, cfg, x))
    got = np.asarray(Q.apply_folded_int8(q, cfg, jnp.asarray(x),
                                         use_pallas=False))
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.15, (got, want)
    agree = ((got > 0) == (want > 0)).mean()
    assert agree >= 0.75  # random-net logits hover near 0; real nets higher


def test_pallas_int8_kernel_bitexact_vs_xla_block(small_net):
    """The Pallas int8 bottleneck and the XLA int8 block must agree
    BIT-EXACTLY (same integer arithmetic)."""
    folded, cfg, q, xs = small_net
    x = xs[0]
    x8 = Q.quantize_input(jnp.asarray(x), q['cfg_scales']['in'])
    h8 = Q._stem_int8(q, x8)
    # layer1 block 2 is stride-1 identity (layers_override (2,2,1,1))
    qb = q['layer1'][1]
    # drive h8 through layer1 block 1 (downsample) on the XLA path first
    acc = Q._conv_int8(q['layer1'][0]['conv1'], h8)
    a8 = Q._requant(acc, q['layer1'][0]['conv1']['m'],
                    q['layer1'][0]['conv1']['b'])
    acc = Q._conv_int8(q['layer1'][0]['conv2'], a8, padding=1)
    a8 = Q._requant(acc, q['layer1'][0]['conv2']['m'],
                    q['layer1'][0]['conv2']['b'])
    acc3 = Q._conv_int8(q['layer1'][0]['conv3'], a8)
    y = (acc3.astype(jnp.float32) * q['layer1'][0]['conv3']['m'] +
         q['layer1'][0]['conv3']['b'])
    accd = Q._conv_int8(q['layer1'][0]['down'], h8)
    iden = (accd.astype(jnp.float32) * q['layer1'][0]['down']['m'] +
            q['layer1'][0]['down']['b'])
    blk_in = jnp.clip(jnp.round(jnp.maximum(y + iden, 0.0)), 0, 127
                      ).astype(jnp.int8)

    # XLA int8 identity block
    acc = Q._conv_int8(qb['conv1'], blk_in)
    a8 = Q._requant(acc, qb['conv1']['m'], qb['conv1']['b'])
    acc = Q._conv_int8(qb['conv2'], a8, padding=1)
    a8 = Q._requant(acc, qb['conv2']['m'], qb['conv2']['b'])
    acc3 = Q._conv_int8(qb['conv3'], a8)
    y = acc3.astype(jnp.float32) * qb['conv3']['m'] + qb['conv3']['b']
    iden = blk_in.astype(jnp.float32) * qb['sxr']
    want = np.asarray(jnp.clip(jnp.round(jnp.maximum(y + iden, 0.0)),
                               0, 127).astype(jnp.int8))

    from instaorder_tpu.ops.pallas_blocks import fused_bottleneck_int8
    got = np.asarray(fused_bottleneck_int8(
        blk_in, qb['conv1']['w'][0, 0], qb['conv1']['m'], qb['conv1']['b'],
        qb['conv2']['w'], qb['conv2']['m'], qb['conv2']['b'],
        qb['conv3']['w'][0, 0], qb['conv3']['m'], qb['conv3']['b'],
        qb['sxr'], interpret=True, batch_tile=1))
    np.testing.assert_array_equal(got, want)


def test_int8_full_path_pallas_interpret_equals_xla(small_net):
    folded, cfg, q, xs = small_net
    from instaorder_tpu.ops import pallas_blocks

    x = jnp.asarray(xs[1])
    want = np.asarray(Q.apply_folded_int8(q, cfg, x, use_pallas=False))

    names = ('fused_bottleneck_int8', 'fused_bottleneck_down_int8',
             'fused_stem_int8')
    origs = {n: getattr(pallas_blocks, n) for n in names}
    for n in names:
        setattr(pallas_blocks, n,
                (lambda o: lambda *a, **kw: o(*a, **dict(kw,
                                                         interpret=True)))(
                    origs[n]))
    try:
        got = np.asarray(Q.apply_folded_int8(q, cfg, x, use_pallas=True))
    finally:
        for n in names:
            setattr(pallas_blocks, n, origs[n])
    np.testing.assert_array_equal(got, want)


def test_int8_full_path_hwnc_pallas_interpret_equals_xla(small_net):
    """The layout-native (hwnc) int8 identity kernel carries the same
    integer arithmetic as the XLA oracle — full-trunk bit exactness,
    including the hwnc<->nhwc view transposes around projection
    blocks."""
    folded, cfg, q, xs = small_net
    from instaorder_tpu.ops import pallas_blocks

    x = jnp.asarray(xs[1])
    want = np.asarray(Q.apply_folded_int8(q, cfg, x, use_pallas=False))

    names = ('fused_bottleneck_int8_hwnc', 'fused_bottleneck_down_int8',
             'fused_bottleneck_down_int8_hwnc',
             'fused_bottleneck_down_s2_int8_hwnc', 'fused_stem_int8')
    origs = {n: getattr(pallas_blocks, n) for n in names}
    for n in names:
        setattr(pallas_blocks, n,
                (lambda o: lambda *a, **kw: o(*a, **dict(kw,
                                                         interpret=True)))(
                    origs[n]))
    try:
        got = np.asarray(Q.apply_folded_int8(
            q, cfg, x, use_pallas=('hwnc', 'down', 'stem')))
    finally:
        for n in names:
            setattr(pallas_blocks, n, origs[n])
    np.testing.assert_array_equal(got, want)


def test_int8_siamese_swap_fold(small_net):
    folded, cfg, q, xs = small_net
    x = jnp.asarray(xs[0])
    o1, o2 = Q.apply_folded_int8_siamese(q, cfg, x, use_pallas=False)
    perm = jnp.asarray([1, 0, 2, 3, 4])
    o2_want = Q.apply_folded_int8(q, cfg, x[..., perm], use_pallas=False)
    # int8 trunk is exact; the f32 head's mean/dot reassociate differently
    # for the 2N-batch program -> 1e-6-level fp noise only
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o2_want),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(Q.apply_folded_int8(q, cfg, x,
                                                       use_pallas=False)),
        atol=1e-5)


# ---------------------------------------------------------------------------
# v2: boundary-int8 storage, float compute (quantize_folded_v2)
# ---------------------------------------------------------------------------


@pytest.fixture(scope='module')
def v2_net(small_net):
    folded, cfg, _q, xs = small_net
    scales = Q.calibrate_folded_resnet(folded, cfg, xs)
    # f32 compute dtype: deterministic CPU math for the parity tests
    qv2 = Q.quantize_folded_v2(folded, cfg, scales,
                               compute_dtype=jnp.float32)
    return folded, cfg, qv2, xs


def test_v2_close_to_f32_and_decisions_agree(v2_net, small_net):
    folded, cfg, qv2, xs = v2_net
    _, _, q_full, _ = small_net
    x = xs[0]
    want = np.asarray(apply_folded(folded, cfg, x))
    got = np.asarray(Q.apply_folded_v2(qv2, cfg, jnp.asarray(x),
                                       use_pallas=False))
    scale = max(np.abs(want).max(), 1e-6)
    # boundary-only quantization: strictly less noise than the fully
    # quantized path (which test_int8_close... bounds at 0.15)
    assert np.abs(got - want).max() / scale < 0.1, (got, want)
    full = np.asarray(Q.apply_folded_int8(q_full, cfg, jnp.asarray(x),
                                          use_pallas=False))
    assert (np.abs(got - want).max() <=
            np.abs(full - want).max() + 1e-3 * scale)


def test_pallas_i8v2_kernel_matches_xla_block(v2_net):
    """The boundary-int8 Pallas kernel vs the XLA v2 identity block:
    identical math up to f32 reassociation — int8 outputs may differ
    only by round() ties (<=1 LSB, rare)."""
    folded, cfg, qv2, xs = v2_net
    h8 = Q._stem_v2(qv2, jnp.asarray(xs[0]))
    # drive through layer1[0] (projection) on the XLA path
    qb0 = qv2['layer1'][0]
    xb = h8.astype(jnp.float32)
    h = jnp.maximum(Q.cnn.conv2d(qb0['conv1'], xb), 0.0)
    h = jnp.maximum(Q.cnn.conv2d(qb0['conv2'], h, padding=1), 0.0)
    y = Q.cnn.conv2d(qb0['conv3'], h)
    iden = Q.cnn.conv2d(qb0['down'], xb)
    blk_in = Q._q8(y + iden)

    qb = qv2['layer1'][1]
    xb = blk_in.astype(jnp.float32)
    h = jnp.maximum(Q.cnn.conv2d(qb['conv1'], xb), 0.0)
    h = jnp.maximum(Q.cnn.conv2d(qb['conv2'], h, padding=1), 0.0)
    y = Q.cnn.conv2d(qb['conv3'], h)
    want = np.asarray(Q._q8(y + xb * qb['r']), np.int32)

    from instaorder_tpu.ops.pallas_blocks import fused_bottleneck_i8v2
    got = np.asarray(fused_bottleneck_i8v2(
        blk_in, qb['conv1']['w'][0, 0], qb['conv1']['b'],
        qb['conv2']['w'], qb['conv2']['b'],
        qb['conv3']['w'][0, 0], qb['conv3']['b'], qb['r'],
        interpret=True, batch_tile=1), np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01


def test_i8v2_kernel_float_io_same_values(v2_net):
    """out_int8=False stores the SAME quantized integers in the compute
    dtype (kernel-to-kernel hop), and float input reproduces the int8
    input's results bit-for-bit."""
    folded, cfg, qv2, xs = v2_net
    from instaorder_tpu.ops.pallas_blocks import fused_bottleneck_i8v2
    h8 = Q._stem_v2(qv2, jnp.asarray(xs[0]))
    qb0 = qv2['layer1'][0]
    xb = h8.astype(jnp.float32)
    h = jnp.maximum(Q.cnn.conv2d(qb0['conv1'], xb), 0.0)
    h = jnp.maximum(Q.cnn.conv2d(qb0['conv2'], h, padding=1), 0.0)
    blk_in = Q._q8(Q.cnn.conv2d(qb0['conv3'], h) +
                   Q.cnn.conv2d(qb0['down'], xb))
    qb = qv2['layer1'][1]
    args = (qb['conv1']['w'][0, 0], qb['conv1']['b'], qb['conv2']['w'],
            qb['conv2']['b'], qb['conv3']['w'][0, 0], qb['conv3']['b'],
            qb['r'])
    got_i8 = np.asarray(fused_bottleneck_i8v2(
        blk_in, *args, interpret=True, batch_tile=1))
    got_f = np.asarray(fused_bottleneck_i8v2(
        blk_in, *args, interpret=True, batch_tile=1, out_int8=False))
    assert got_f.dtype == np.float32
    np.testing.assert_array_equal(got_f.astype(np.int8), got_i8)
    # float (integer-valued) input == int8 input
    got_f_in = np.asarray(fused_bottleneck_i8v2(
        blk_in.astype(jnp.float32), *args, interpret=True, batch_tile=1))
    np.testing.assert_array_equal(got_f_in, got_i8)


def test_v2_down1_kernel_matches_xla_block(v2_net):
    """fused_bottleneck_down_i8v2 (stride-1 projection, layer1[0]) vs
    the XLA v2 path — <=1 LSB round ties only."""
    folded, cfg, qv2, xs = v2_net
    from instaorder_tpu.ops.pallas_blocks import fused_bottleneck_down_i8v2
    h8 = Q._stem_v2(qv2, jnp.asarray(xs[0]))
    qb = qv2['layer1'][0]
    xb = h8.astype(jnp.float32)
    h = jnp.maximum(Q.cnn.conv2d(qb['conv1'], xb), 0.0)
    h = jnp.maximum(Q.cnn.conv2d(qb['conv2'], h, padding=1), 0.0)
    want = np.asarray(Q._q8(Q.cnn.conv2d(qb['conv3'], h) +
                            Q.cnn.conv2d(qb['down'], xb)), np.int32)
    got = np.asarray(fused_bottleneck_down_i8v2(
        h8, qb['conv1']['w'][0, 0], qb['conv1']['b'], qb['conv2']['w'],
        qb['conv2']['b'], qb['conv3']['w'][0, 0], qb['conv3']['b'],
        qb['down']['w'][0, 0], qb['down']['b'],
        interpret=True, batch_tile=1), np.int32)
    diff = np.abs(got - want)
    assert diff.max() <= 1, diff.max()
    assert (diff > 0).mean() < 0.01
    # float-output variant carries the same integers
    got_f = np.asarray(fused_bottleneck_down_i8v2(
        h8, qb['conv1']['w'][0, 0], qb['conv1']['b'], qb['conv2']['w'],
        qb['conv2']['b'], qb['conv3']['w'][0, 0], qb['conv3']['b'],
        qb['down']['w'][0, 0], qb['down']['b'],
        interpret=True, batch_tile=1, out_int8=False))
    np.testing.assert_array_equal(got_f.astype(np.int32), got)


def test_v2_stage_fusion_empty_run_falls_back(v2_net):
    """hwncs1d/hwncp with an iden_cin_cap that admits the Cin=64
    projection but rejects the Cin=256 identity blocks leaves an empty
    stage run — the path must fall back to the per-block down kernel
    instead of a 0-block stage call (ADVICE r4 item 2: jnp.stack([])
    crashed with an opaque error)."""
    folded, cfg, qv2, xs = v2_net
    from instaorder_tpu.ops import pallas_blocks

    x = jnp.asarray(xs[1])
    want = np.asarray(Q.apply_folded_v2(qv2, cfg, x, use_pallas=False))
    names = ('fused_bottleneck_i8v2_hwnc',
             'fused_bottleneck_i8v2_hwnc_stage',
             'fused_bottleneck_i8v2_hwncp_stage',
             'fused_bottleneck_down_i8v2_hwnc',
             'fused_bottleneck_down_s2_i8v2_hwnc')
    origs = {n: getattr(pallas_blocks, n) for n in names}
    for n in names:
        setattr(pallas_blocks, n,
                (lambda o: lambda *a, **kw: o(*a, **dict(kw,
                                                         interpret=True)))(
                    origs[n]))
    try:
        got = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down2', 'hwncs1d'),
            iden_cin_cap=64))
        got_p = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down2', 'hwncp'),
            iden_cin_cap=64))
    finally:
        for n in names:
            setattr(pallas_blocks, n, origs[n])
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.02
    assert np.abs(got_p - want).max() / scale < 0.02


def test_v2_full_path_pallas_interpret_close_to_xla(v2_net):
    folded, cfg, qv2, xs = v2_net
    from instaorder_tpu.ops import pallas_blocks

    x = jnp.asarray(xs[1])
    want = np.asarray(Q.apply_folded_v2(qv2, cfg, x, use_pallas=False))

    names = ('fused_bottleneck_i8v2', 'fused_bottleneck_down_i8v2',
             'fused_bottleneck_i8v2_hwnc', 'fused_bottleneck_i8v2_hwnc_stage',
             'fused_bottleneck_i8v2_hwncp_stage',
             'fused_bottleneck_down_i8v2_hwnc',
             'fused_bottleneck_down_s2_i8v2_hwnc', 'fused_stem')
    origs = {n: getattr(pallas_blocks, n) for n in names}
    for n in names:
        setattr(pallas_blocks, n,
                (lambda o: lambda *a, **kw: o(*a, **dict(kw,
                                                         interpret=True)))(
                    origs[n]))
    try:
        got = np.asarray(Q.apply_folded_v2(qv2, cfg, x,
                                           use_pallas=('identity',)))
        got_d1 = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('identity', 'down1')))
        got_hwnc = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc',)))
        got_hwncs = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwncs',)))
        got_hwnc_d1 = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down1')))
        got_hwnc_d2 = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down1', 'down2')))
        got_hwncs1 = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down1', 'down2',
                                     'hwncs1')))
        got_hwncs_all = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down1', 'down2', 'hwncs',
                                     'hwncs1')))
        got_hwncs1d = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down2', 'hwncs1d')))
        got_hwncp = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down2', 'hwncp')))
        got_hwnc_s8 = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc',), hwnc_io='s8'))
        got_hwnc_sc = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc',), conv2_mode='scatter'))
        got_hwnc_sc16 = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'down1'),
            conv2_mode='scatter16'))
        got_hwnc_stem = np.asarray(Q.apply_folded_v2(
            qv2, cfg, x, use_pallas=('hwnc', 'stem')))
    finally:
        for n in names:
            setattr(pallas_blocks, n, origs[n])
    # boundary round() ties may flip 1 LSB; heads smooth that to <<1%
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.02
    assert np.abs(got_d1 - want).max() / scale < 0.02
    assert np.abs(got_hwnc - want).max() / scale < 0.02
    assert np.abs(got_hwnc_d1 - want).max() / scale < 0.02
    assert np.abs(got_hwnc_d2 - want).max() / scale < 0.02
    # stage-fused hwnc carries the same quantized integers through the
    # run as per-block hwnc: identical math, VMEM-resident activation
    np.testing.assert_allclose(got_hwncs, got_hwnc, atol=1e-4)
    # layer1 stage fusion (hwncs1): down1's forced-s8 epilogue and the
    # 'act'-staged run carry the same quantized integers — identical to
    # the per-block down12 path
    np.testing.assert_allclose(got_hwncs1, got_hwnc_d2, atol=1e-4)
    # whole-trunk stage fusion (hwncs L2-4 + hwncs1 L1 + down kernels)
    np.testing.assert_allclose(got_hwncs_all, got_hwnc_d2, atol=1e-4)
    # layer1 projection+identity single-call fusion (hwncs1d): the
    # projection output staged in VMEM carries the same quantized
    # integers as the down1-kernel + hwncs1-stage pair
    np.testing.assert_allclose(got_hwncs1d, got_hwnc_d2, atol=1e-4)
    # s8 inter-kernel storage holds the same quantized integers as the
    # float storage (0..127 exact in bf16): bit-identical results
    np.testing.assert_allclose(got_hwnc_s8, got_hwnc, atol=1e-4)
    # lane-packed layer1 (hwncp): the packed K=12Cm conv2 reassociates
    # the f32 accumulation (zero-padded taps interleaved), so the
    # scatter-style closeness bar applies, not the bit-exact one
    assert np.abs(got_hwncp - want).max() / scale < 0.02
    # scatter conv2 (full-width matmul + shifted adds) reorders the
    # f32 tap accumulation; boundary round ties may flip 1 LSB
    assert np.abs(got_hwnc_sc - want).max() / scale < 0.02
    # scatter16 additionally rounds each tap product to bf16 before the
    # f32 accumulate — still quantize-boundary-level deviations only
    assert np.abs(got_hwnc_sc16 - want).max() / scale < 0.05
    # fused v2 stem: same bf16 conv/pool/quantize math, f32-acc dots ->
    # boundary round ties only
    assert np.abs(got_hwnc_stem - want).max() / scale < 0.05


def test_v2_stem2_s2d_matches_stock_stem(v2_net):
    """'stem2' (2x2 space-to-depth stem, folding.s2d_conv1_w) is the
    same conv term-for-term — f32 outputs differ only by reassociation,
    so the int8 stem output may differ by round() ties (<=1 LSB,
    rare)."""
    _folded, _cfg, qv2, xs = v2_net
    x = jnp.asarray(xs[0])
    want = np.asarray(Q._stem_v2(qv2, x)).astype(np.int32)
    got = np.asarray(Q._stem_v2(qv2, x, use_pallas=('stem2',))
                     ).astype(np.int32)
    d = np.abs(got - want)
    assert d.max() <= 1, d.max()
    assert (d != 0).mean() < 1e-3, (d != 0).mean()


def test_v2_qpool_stem_bitexact(v2_net):
    """'qpool' (quantize before the max-pool): round/clip/relu and max
    are monotone, so the swap is exact — outputs must be bit-identical,
    in both stem variants."""
    _folded, _cfg, qv2, xs = v2_net
    x = jnp.asarray(xs[0])
    want = np.asarray(Q._stem_v2(qv2, x))
    got = np.asarray(Q._stem_v2(qv2, x, use_pallas=('qpool',)))
    np.testing.assert_array_equal(got, want)
    w2 = np.asarray(Q._stem_v2(qv2, x, use_pallas=('stem2',)))
    g2 = np.asarray(Q._stem_v2(qv2, x, use_pallas=('stem2', 'qpool')))
    np.testing.assert_array_equal(g2, w2)


def test_v2_siamese_swap_fold(v2_net):
    folded, cfg, qv2, xs = v2_net
    x = jnp.asarray(xs[0])
    o1, o2 = Q.apply_folded_v2_siamese(qv2, cfg, x, use_pallas=False)
    perm = jnp.asarray([1, 0, 2, 3, 4])
    np.testing.assert_allclose(
        np.asarray(o2),
        np.asarray(Q.apply_folded_v2(qv2, cfg, x[..., perm],
                                     use_pallas=False)), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(o1),
        np.asarray(Q.apply_folded_v2(qv2, cfg, x, use_pallas=False)),
        atol=1e-4)


def test_v2_hwnc_unaligned_batch_padding(v2_net):
    """The hwnc kernels ride the batch on the sublane-adjacent dim and
    Mosaic rejects unaligned batches ON HARDWARE (interpret mode can't
    see it — found live: batch 45 failed layout inference while the
    1080-pair bench compiled). _apply_trunk_v2 now zero-pads the batch
    to a multiple of 8 and slices the pooled features; padded entries
    must not perturb the real ones."""
    folded, cfg, qv2, xs = v2_net
    from instaorder_tpu.ops import pallas_blocks
    x3 = jnp.asarray(np.concatenate([xs[0], xs[1][:1]]))   # batch 3
    want = np.asarray(Q.apply_folded_v2(qv2, cfg, x3, use_pallas=False))

    names = ('fused_bottleneck_i8v2_hwnc', 'fused_bottleneck_i8v2_hwnc_stage')
    origs = {n: getattr(pallas_blocks, n) for n in names}
    for n in names:
        setattr(pallas_blocks, n,
                (lambda o: lambda *a, **kw: o(*a, **dict(kw,
                                                         interpret=True)))(
                    origs[n]))
    try:
        got = np.asarray(Q.apply_folded_v2(qv2, cfg, x3,
                                           use_pallas=('hwnc',)))
        got_s = np.asarray(Q.apply_folded_v2(qv2, cfg, x3,
                                             use_pallas=('hwncs',)))
    finally:
        for n in names:
            setattr(pallas_blocks, n, origs[n])
    assert got.shape == want.shape
    scale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / scale < 0.02
    np.testing.assert_allclose(got_s, got, atol=1e-4)


def test_v2_siamese_dirpack_bitexact(v2_net):
    """'dirpack' rides the siamese direction axis into the trunk as an
    interleaved batch (transpose + row-major reshape — bitcasts on
    hardware) instead of the channel-split + batch-concat fusions. A
    pure reorder of a batch-independent computation: both heads must
    match the default siamese path BIT-for-bit, for every trunk route
    (pallas-interpret kernels and XLA fallback)."""
    folded, cfg, qv2, xs = v2_net
    from instaorder_tpu.ops import pallas_blocks
    x4 = jnp.asarray(np.concatenate([xs[0], xs[1]]))    # batch 4: 2n%8==0

    names = ('fused_bottleneck_i8v2_hwnc', 'fused_bottleneck_i8v2_hwnc_stage',
             'fused_bottleneck_down_s2_i8v2_hwnc')
    origs = {n: getattr(pallas_blocks, n) for n in names}
    for n in names:
        setattr(pallas_blocks, n,
                (lambda o: lambda *a, **kw: o(*a, **dict(kw,
                                                         interpret=True)))(
                    origs[n]))
    try:
        feats = ('hwnc', 'down2', 'hwncs1d')
        want = Q.apply_folded_v2_siamese(qv2, cfg, x4, use_pallas=feats)
        got = Q.apply_folded_v2_siamese(qv2, cfg, x4,
                                        use_pallas=feats + ('dirpack',))
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        # unaligned batches (2n not a multiple of 8): dirpack pads the
        # pair axis to a multiple of 4 with zero images and slices the
        # heads back — still bit-exact (n=2 -> pad 2, n=3 -> pad 1)
        for xn in (jnp.asarray(xs[0]), x4[:3]):
            wn = Q.apply_folded_v2_siamese(qv2, cfg, xn, use_pallas=feats)
            gn = Q.apply_folded_v2_siamese(qv2, cfg, xn,
                                           use_pallas=feats + ('dirpack',))
            for w, g in zip(wn, gn):
                np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    finally:
        for n in names:
            setattr(pallas_blocks, n, origs[n])


def test_calibration_scales_shape(small_net):
    folded, cfg, q, xs = small_net
    assert q['conv1']['w'].dtype == jnp.int8
    assert q['layer2'][0]['down']['w'].dtype == jnp.int8
    m = q['layer1'][0]['conv2']['m']
    assert m.shape == (q['layer1'][0]['conv2']['w'].shape[-1],)
    assert float(q['s_feat']) > 0


def test_calibration_chunking_is_exact(small_net, monkeypatch):
    """absmax is chunk-associative, so chunked calibration must match
    the unchunked run up to XLA's batch-size-dependent conv reduction
    order (ulp-level). The chunking bounds HBM liveness — the f32
    forward at 2160 calibration images OOMed the 16G chip (round-4
    fix for the pairs-2160 bench crash)."""
    folded, cfg, _q, xs = small_net
    big = np.concatenate([xs[0], xs[1]], axis=0)       # (4, 64, 64, 5)
    want = Q.calibrate_folded_resnet(folded, cfg, [big])
    monkeypatch.setattr(Q, 'CAL_CHUNK', 1)             # force 4 chunks
    got = Q.calibrate_folded_resnet(folded, cfg, [big])
    flat_w, _ = jax.tree_util.tree_flatten(want)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    assert len(flat_w) == len(flat_g) and flat_w
    for a, b in zip(flat_w, flat_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5)
