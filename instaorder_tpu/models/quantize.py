"""int8 post-training quantization of the folded ResNet serving trunk.

The bf16 serving path is HBM-bandwidth bound (~90 MB of activations per
pair even with perfect fusion => ~9k pairs/s hard bound, PERFORMANCE.md).
Storing every inter-block activation as int8 halves that traffic.

Scheme (standard PTQ):
  * activations: per-tensor static scales, calibrated as absmax/127 over
    sample batches at every block boundary (post-relu, so ranges are
    one-sided [0, 127]);
  * weights: per-output-channel scales, round-to-nearest;
  * conv epilogues fold (s_in * s_w / s_out) into one per-channel
    multiplier and bias/s_out into one per-channel offset, so a block is
    int8 in -> matmul -> mul/add/relu/round/clip -> int8 out;
  * arithmetic is native int8 x int8 -> int32 on the MXU (2x the bf16
    rate) in both the XLA convs and the pallas kernels — bit-exact;
  * stride-1 identity bottlenecks run in the VMEM-resident Pallas kernel
    (ops/pallas_blocks.fused_bottleneck_int8); stem/downsample blocks run
    XLA convs with int8 HBM storage; heads stay f32.

The reference has no quantized path; this is the TPU serving fast path.
Accuracy is validated by logit/decision agreement against the f32
predictor (tests/test_quantize.py); released-checkpoint Table-3 parity
of the int8 path additionally needs the real assets.

Two schemes live here:
  * the round-2 FULLY-quantized path above (quantize_folded_resnet /
    apply_folded_int8*) — int8 arithmetic everywhere; bit-exact vs the
    XLA int8 oracle but measured VPU-bound (PERFORMANCE.md post-mortem);
  * the round-3 v2 path below (quantize_folded_v2 / apply_folded_v2*) —
    int8 ONLY as boundary storage, bf16 compute; the measured-best
    serving config (bench.py default).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..core import nn as cnn


def _absmax(x):
    return jnp.max(jnp.abs(x)).astype(jnp.float32)


# calibration forward chunk (images per jit call) — see
# calibrate_folded_resnet
CAL_CHUNK = 512


def _conv_f32(p, x, **kw):
    return cnn.conv2d(p, x, **kw)


def calibrate_folded_resnet(folded, cfg, xs):
    """Run the f32 folded forward on sample batch(es) `xs` (list of
    (N,H,W,C) f32 arrays, already prep-normalized) recording absmax at
    every quantization boundary. Returns a scales pytree (f32 scalars:
    absmax/127, floored at 1e-8)."""
    if not isinstance(xs, (list, tuple)):
        xs = [xs]

    def one_batch(x):
        rec: Dict[str, Any] = {'in': _absmax(x)}
        out = jax.nn.relu(_conv_f32(folded['conv1'], x, stride=2, padding=3))
        out = cnn.max_pool(out, 3, 2, 1)
        rec['stem'] = _absmax(out)
        block = cfg['block']
        assert block == 'bottleneck', 'int8 path targets resnet50-family'
        groups = cfg['groups']
        for li in range(4):
            rl = []
            for bi, bp in enumerate(folded[f'layer{li + 1}']):
                stride = 2 if (li > 0 and bi == 0) else 1
                identity = out
                h = jax.nn.relu(_conv_f32(bp['conv1'], out))
                r = {'h1': _absmax(h)}
                h = jax.nn.relu(_conv_f32(bp['conv2'], h, stride=stride,
                                          padding=1, groups=groups))
                r['h2'] = _absmax(h)
                hh = _conv_f32(bp['conv3'], h)
                if 'down' in bp:
                    identity = _conv_f32(bp['down'], out, stride=stride)
                out = jax.nn.relu(hh + identity)
                r['out'] = _absmax(out)
                rl.append(r)
            rec[f'layer{li + 1}'] = rl
        return rec

    # bound the per-call HBM liveness: the f32 forward's layer1
    # temporaries are 4MB/image x ~2 live copies, so a 2160-image
    # calibration batch (bench --pairs-per-step 2160) peaks at ~17G and
    # OOMs the 16G chip — absmax is chunk-associative, so split large
    # batches (<=CAL_CHUNK images keeps the peak ~4G)
    xs = [x[i:i + CAL_CHUNK] for x in xs
          for i in range(0, int(x.shape[0]), CAL_CHUNK)]
    recs = [jax.jit(one_batch)(jnp.asarray(x, jnp.float32)) for x in xs]
    import functools as _ft
    merged = jax.tree_util.tree_map(
        lambda *v: _ft.reduce(jnp.maximum, v), *recs)
    return jax.tree_util.tree_map(
        lambda a: jnp.maximum(np.float32(np.asarray(a)) / 127.0, 1e-8),
        jax.device_get(merged))


def _quant_w(w):
    """HWIO weight -> (int8 weight, per-out-channel f32 scale)."""
    w = np.asarray(w, np.float32)
    s = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0) / 127.0,
                   1e-8).astype(np.float32)
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return q, s


def quantize_folded_resnet(folded, cfg, scales):
    """folded f32 params + calibration scales -> int8 serving params.

    Per conv the epilogue is y_q = clip(round(relu(acc * m + b)), 0, 127)
    with m = s_in*s_w/s_out per channel, b = bias/s_out. Residual adds
    x_q * (s_x/s_out) before the relu (sxr scalar).
    """
    q: Dict[str, Any] = {'cfg_scales': {'in': float(scales['in']),
                                        'stem': float(scales['stem'])}}
    w8, sw = _quant_w(folded['conv1']['w'])
    q['conv1'] = {
        'w': jnp.asarray(w8),
        'm': jnp.asarray(float(scales['in']) * sw / float(scales['stem'])),
        'b': jnp.asarray(np.asarray(folded['conv1']['b'], np.float32) /
                         float(scales['stem'])),
    }
    s_prev = float(scales['stem'])
    for li in range(4):
        name = f'layer{li + 1}'
        stage = []
        for bi, bp in enumerate(folded[name]):
            sc = scales[name][bi]
            s_h1, s_h2, s_out = (float(sc['h1']), float(sc['h2']),
                                 float(sc['out']))
            qb: Dict[str, Any] = {}
            for ci, (s_i, s_o) in zip(
                    (1, 2, 3), [(s_prev, s_h1), (s_h1, s_h2),
                                (s_h2, s_out)]):
                w8, sw = _quant_w(bp[f'conv{ci}']['w'])
                qb[f'conv{ci}'] = {
                    'w': jnp.asarray(w8),
                    'm': jnp.asarray(s_i * sw / s_o),
                    'b': jnp.asarray(
                        np.asarray(bp[f'conv{ci}']['b'], np.float32) / s_o),
                }
            if 'down' in bp:
                w8, sw = _quant_w(bp['down']['w'])
                # the projection feeds the residual add in conv3's output
                # scale domain
                qb['down'] = {
                    'w': jnp.asarray(w8),
                    'm': jnp.asarray(s_prev * sw / s_out),
                    'b': jnp.asarray(
                        np.asarray(bp['down']['b'], np.float32) / s_out),
                }
            else:
                qb['sxr'] = np.float32(s_prev / s_out)
            qb['s_out'] = np.float32(s_out)
            stage.append(qb)
            s_prev = s_out
        q[name] = stage
    for fc in ('fc', 'fc_occ', 'fc_depth'):
        if fc in folded:
            q[fc] = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float32), folded[fc])
    q['s_feat'] = np.float32(s_prev)
    return q


def _requant(acc, m, b, relu=True):
    y = acc.astype(jnp.float32) * m + b
    if relu:
        y = jnp.maximum(y, 0.0)
    return jnp.clip(jnp.round(y), -127 if not relu else 0, 127
                    ).astype(jnp.int8)


def _conv_int8(qp, x8, stride=1, padding=0, groups=1):
    """XLA int8 conv: int8 x int8 -> int32 acc (native MXU int8 mode)."""
    assert groups == 1
    return jax.lax.conv_general_dilated(
        x8, qp['w'], (stride, stride), [(padding, padding)] * 2,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)


def quantize_input(x, s_in):
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s_in), -127, 127
                    ).astype(jnp.int8)


# int8 default: projection blocks MUST run fused — the XLA int8 path
# materialises their full s32 accumulators ((N,64,64,256) = 8.4GB at
# serving batch) and OOMs HBM. A/B: identity+down+XLA-chunked-stem 3279
# > +pallas-stem 2758 > XLA-unchunked-stem 2614 pairs/s.
_PALLAS_DEFAULT_INT8 = frozenset(('identity', 'down'))


def _pallas_features(use_pallas):
    from .folding import _pallas_features as shared
    return shared(use_pallas, default=_PALLAS_DEFAULT_INT8)


def _apply_trunk_int8(q, cfg, h8, use_pallas=True, conv2_mode='im2col',
                      pipeline=False):
    """int8 stem output -> f32 head logits. conv2_mode/pipeline: the
    hwnc identity kernel's 3x3 strategy and band-order knobs (scatter16
    is float-only; im2col/acc/scatter are valid here)."""
    feats = _pallas_features(use_pallas)
    groups = cfg['groups']
    assert groups == 1, 'int8 path: groups>1 stays on the bf16 path'
    # hwnc kernels need an 8-aligned batch (sublane-adjacent dim; see
    # _apply_trunk_v2) — pad with zero images, slice the pooled features
    n_in = h8.shape[0]
    pad8 = (-n_in) % 8
    if 'hwnc' in feats and pad8:
        h8 = jnp.pad(h8, ((0, pad8),) + ((0, 0),) * (h8.ndim - 1))
    is_t = False   # h8 currently in the (H, W, N, C) hwnc view
    for li in range(4):
        for bi, qb in enumerate(q[f'layer{li + 1}']):
            stride = 2 if (li > 0 and bi == 0) else 1
            if 'down' not in qb and stride == 1 and 'hwnc' in feats:
                # layout-native int8 kernel: s8 MXU dots on the
                # (H, W, N, C) view, bitcast entry/exit (see
                # fused_bottleneck_int8_hwnc)
                from ..ops.pallas_blocks import fused_bottleneck_int8_hwnc
                if not is_t:
                    h8 = jnp.transpose(h8, (1, 2, 0, 3))
                    is_t = True
                h8 = fused_bottleneck_int8_hwnc(
                    h8, qb['conv1']['w'][0, 0], qb['conv1']['m'],
                    qb['conv1']['b'], qb['conv2']['w'], qb['conv2']['m'],
                    qb['conv2']['b'], qb['conv3']['w'][0, 0],
                    qb['conv3']['m'], qb['conv3']['b'], qb['sxr'],
                    conv2_mode=conv2_mode, pipeline=pipeline)
                continue
            if 'down' in qb and 'hwnc' in feats and 'down' in feats:
                # layout-native int8 projection kernels: the NHWC down
                # kernels cost a relayout copy at each hwnc boundary;
                # these stay in the (H, W, N, C) view
                from ..ops.pallas_blocks import (
                    fused_bottleneck_down_int8_hwnc,
                    fused_bottleneck_down_s2_int8_hwnc)
                if not is_t:
                    h8 = jnp.transpose(h8, (1, 2, 0, 3))
                    is_t = True
                fn = (fused_bottleneck_down_s2_int8_hwnc if stride == 2
                      else fused_bottleneck_down_int8_hwnc)
                h8 = fn(h8, qb['conv1']['w'][0, 0], qb['conv1']['m'],
                        qb['conv1']['b'], qb['conv2']['w'],
                        qb['conv2']['m'], qb['conv2']['b'],
                        qb['conv3']['w'][0, 0], qb['conv3']['m'],
                        qb['conv3']['b'], qb['down']['w'][0, 0],
                        qb['down']['m'], qb['down']['b'])
                continue
            if is_t:
                h8 = jnp.transpose(h8, (2, 0, 1, 3))
                is_t = False
            if 'down' not in qb and stride == 1 and 'identity' in feats:
                from ..ops.pallas_blocks import fused_bottleneck_int8
                h8 = fused_bottleneck_int8(
                    h8, qb['conv1']['w'][0, 0], qb['conv1']['m'],
                    qb['conv1']['b'], qb['conv2']['w'], qb['conv2']['m'],
                    qb['conv2']['b'], qb['conv3']['w'][0, 0],
                    qb['conv3']['m'], qb['conv3']['b'], qb['sxr'])
                continue
            if 'down' in qb and 'down' in feats:
                # projection blocks: the XLA path materialises the full
                # s32 conv accumulators ((N,64,64,256) = 8.4GB at bench
                # batch — HBM OOM); the fused kernel keeps them in VMEM
                from ..ops.pallas_blocks import fused_bottleneck_down_int8
                h8 = fused_bottleneck_down_int8(
                    h8, qb['conv1']['w'][0, 0], qb['conv1']['m'],
                    qb['conv1']['b'], qb['conv2']['w'], qb['conv2']['m'],
                    qb['conv2']['b'], qb['conv3']['w'][0, 0],
                    qb['conv3']['m'], qb['conv3']['b'],
                    qb['down']['w'][0, 0], qb['down']['m'],
                    qb['down']['b'], stride=stride)
                continue
            acc = _conv_int8(qb['conv1'], h8)
            a8 = _requant(acc, qb['conv1']['m'], qb['conv1']['b'])
            acc = _conv_int8(qb['conv2'], a8, stride=stride, padding=1)
            a8 = _requant(acc, qb['conv2']['m'], qb['conv2']['b'])
            acc3 = _conv_int8(qb['conv3'], a8)
            y = acc3.astype(jnp.float32) * qb['conv3']['m'] + qb['conv3']['b']
            if 'down' in qb:
                accd = _conv_int8(qb['down'], h8, stride=stride)
                iden = (accd.astype(jnp.float32) * qb['down']['m'] +
                        qb['down']['b'])
            else:
                iden = h8.astype(jnp.float32) * qb['sxr']
            h8 = jnp.clip(jnp.round(jnp.maximum(y + iden, 0.0)), 0, 127
                          ).astype(jnp.int8)
    # pool directly in whichever view the trunk ended in — transposing
    # (8, 8, N, 2048) back to NHWC just to mean over H, W is a relayout
    feat = h8.astype(jnp.float32) * q['s_feat']
    pooled = jnp.mean(feat, axis=(0, 1) if is_t else (1, 2))[:n_in]
    if cfg['dual_head']:
        return (cnn.linear(q['fc_occ'], pooled),
                cnn.linear(q['fc_depth'], pooled))
    return cnn.linear(q['fc'], pooled)


def _stem_int8(q, x8, use_pallas=False, chunks=1):
    """int8 stem. `chunks` bounds the XLA stem's HBM liveness; the fused
    pallas stem ('stem' in use_pallas) is VMEM-resident and has no such
    liveness problem, so `chunks` is intentionally a no-op there."""
    feats = _pallas_features(use_pallas)
    if ('stem' in feats and q['conv1']['w'].shape[:2] == (7, 7) and
            x8.shape[1] % 4 == 0 and x8.shape[2] % 4 == 0):
        # VMEM-resident stem (no (N,128,128,64) s32/int8 HBM round trips)
        from ..ops.pallas_blocks import fused_stem_int8
        return fused_stem_int8(x8, q['conv1']['w'], q['conv1']['m'],
                               q['conv1']['b'])
    def stem(xc):
        acc = _conv_int8(q['conv1'], xc, stride=2, padding=3)
        h = _requant(acc, q['conv1']['m'], q['conv1']['b'])
        # maxpool commutes with the monotone requant: pool int8 directly
        return jax.lax.reduce_window(
            h, jnp.int8(-128), jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)])
    n = x8.shape[0]
    while chunks > 1 and n % chunks:
        chunks -= 1
    if chunks <= 1:
        return stem(x8)
    # sequential chunks bound the (N, H/2, W/2, 64) s32 accumulator /
    # requant transients at serving batch sizes
    xs = x8.reshape(chunks, n // chunks, *x8.shape[1:])
    return jax.lax.map(stem, xs).reshape(n, x8.shape[1] // 4,
                                         x8.shape[2] // 4, -1)


def apply_folded_int8(q, cfg, x, use_pallas=True, stem_chunks=1,
                      conv2_mode='im2col', pipeline=False):
    """f32/bf16 prep output -> int8 trunk -> f32 logits."""
    x8 = quantize_input(x, q['cfg_scales']['in'])
    h8 = _stem_int8(q, x8, use_pallas=use_pallas, chunks=stem_chunks)
    return _apply_trunk_int8(q, cfg, h8, use_pallas=use_pallas,
                             conv2_mode=conv2_mode, pipeline=pipeline)


# ---------------------------------------------------------------------------
# v2: boundary-int8 storage, float compute.
#
# Round 2 measured the fully-quantized path ~2x slower per kernel than
# bf16 (VPU-serial requant epilogues + packed-s8 sublane shuffles,
# PERFORMANCE.md int8 post-mortem). v2 keeps int8 ONLY as the HBM storage
# format at block boundaries — the stem output and every bottleneck
# output — while all arithmetic inside a block runs in bf16 (or f32 for
# tests) exactly like the unquantized path. Inter-block HBM traffic
# halves; the MXU/VPU work is identical to bf16; quantization error is
# limited to one round/clip per boundary (no h1/h2 quantization at all).
#
# Scale algebra per block with boundary scales s_in (input) / s_out:
#   conv1 w *= s_in          (int8 input casts straight into the matmul)
#   conv3 w /= s_out, b /= s_out
#   down  w *= s_in / s_out, b /= s_out
#   identity residual: + x_int8 * (s_in / s_out)
#   output: clip(round(relu(.)), 0, 127) -> int8
# The stem folds 1/s_stem into conv1 (input x stays unquantized — prep
# output feeds the conv in the compute dtype, bit-identical to bf16).
# ---------------------------------------------------------------------------


def quantize_folded_v2(folded, cfg, scales, compute_dtype=jnp.bfloat16):
    """folded f32 params + boundary calibration scales (only 'in'/'stem'
    and per-block 'out' entries of calibrate_folded_resnet are used) ->
    v2 serving params: compute-dtype weights with boundary scales
    folded, f32 biases, int8 storage at block boundaries."""
    cdt = compute_dtype

    def _w(a, mul=1.0):
        return jnp.asarray(np.asarray(a, np.float32) * mul, cdt)

    def _b(a, mul=1.0):
        return jnp.asarray(np.asarray(a, np.float32) * mul, jnp.float32)

    s_stem = float(scales['stem'])
    q: Dict[str, Any] = {
        'conv1': {'w': _w(folded['conv1']['w'], 1.0 / s_stem),
                  'b': _b(folded['conv1']['b'], 1.0 / s_stem)},
    }
    s_prev = s_stem
    for li in range(4):
        name = f'layer{li + 1}'
        stage = []
        for bi, bp in enumerate(folded[name]):
            s_out = float(scales[name][bi]['out'])
            qb: Dict[str, Any] = {
                'conv1': {'w': _w(bp['conv1']['w'], s_prev),
                          'b': _b(bp['conv1']['b'])},
                'conv2': {'w': _w(bp['conv2']['w']),
                          'b': _b(bp['conv2']['b'])},
                'conv3': {'w': _w(bp['conv3']['w'], 1.0 / s_out),
                          'b': _b(bp['conv3']['b'], 1.0 / s_out)},
            }
            if 'down' in bp:
                qb['down'] = {'w': _w(bp['down']['w'], s_prev / s_out),
                              'b': _b(bp['down']['b'], 1.0 / s_out)}
            else:
                qb['r'] = np.float32(s_prev / s_out)
            stage.append(qb)
            s_prev = s_out
        q[name] = stage
    for fc in ('fc', 'fc_occ', 'fc_depth'):
        if fc in folded:
            q[fc] = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float32), folded[fc])
    q['s_feat'] = np.float32(s_prev)
    return q


def _q8(y):
    """f32 pre-activation -> one-sided int8 boundary storage."""
    return jnp.clip(jnp.round(jnp.maximum(y, 0.0)), 0, 127).astype(jnp.int8)


def _stem_v2(q, x, chunks=1, use_pallas=False):
    """Compute-dtype stem conv (1/s_stem folded) -> maxpool -> int8
    requant AFTER the pool (round/clip/relu and max-pool are monotone
    and commute, so this equals quantize-then-pool up to the compute-
    dtype cast; the quantize pass then runs on the 4x smaller pooled
    tensor instead of the 128^2 conv output).

    use_pallas with 'stem': the fused parity-plane stem kernel
    (ops/pallas_blocks.fused_stem, q8=True) — conv+relu+pool+quantize
    with the 128^2 conv output never leaving VMEM; `chunks` is
    intentionally a no-op there (no HBM liveness to bound)."""
    from .folding import _pallas_features as _feats
    cdt = q['conv1']['w'].dtype
    feats = _feats(use_pallas, default=frozenset())
    if ('stem' in feats and q['conv1']['w'].shape[:2] == (7, 7)
            and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
        from ..ops.pallas_blocks import fused_stem
        return fused_stem(x.astype(cdt), q['conv1']['w'],
                          q['conv1']['b'], q8=True)
    # 'stem2': the same conv re-expressed over a 2x2 space-to-depth
    # input (folding.s2d_conv1_w) — Cin 5 -> 20 fills the MXU
    # contraction dim the stock Cin=5 stem starves (26% of peak in
    # trace_r4_default.txt). Same taps/same math; bf16 reassociation
    # only.
    stem2 = ('stem2' in feats and q['conv1']['w'].shape[:2] == (7, 7)
             and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
    if stem2:
        from .folding import s2d_conv1_w, s2d_stem_input
        p2 = {'w': s2d_conv1_w(q['conv1']['w']), 'b': q['conv1']['b']}

    def stem(xc):
        if stem2:
            h = cnn.conv2d(p2, s2d_stem_input(xc.astype(cdt)),
                           stride=1, padding=0)
        else:
            h = cnn.conv2d(q['conv1'], xc.astype(cdt), stride=2,
                           padding=3)
        h = jnp.maximum(h, 0.0).astype(cdt)
        if 'qpool' in feats:
            # quantize BEFORE the pool: round/clip/relu and max are
            # monotone, so max(q(a), q(b)) == q(max(a, b)) bit-for-bit
            # (the docstring identity, used in the other direction).
            # XLA fuses the quantize into the conv epilogue, so the
            # pool reads s8 instead of bf16 — 4x less HBM traffic on
            # the (N, 128, 128, 128) plane (trace_r4_default.txt
            # fusion.17: 5.1 ms where the s8 floor is ~1.5).
            return cnn.max_pool(_q8(h), 3, 2, 1)
        return _q8(cnn.max_pool(h, 3, 2, 1))
    n = x.shape[0]
    while chunks > 1 and n % chunks:
        chunks -= 1
    if chunks <= 1:
        return stem(x)
    xs = x.reshape(chunks, n // chunks, *x.shape[1:])
    return jax.lax.map(stem, xs).reshape(n, x.shape[1] // 4,
                                         x.shape[2] // 4, -1)


# v2 default: layout-native hwnc kernels over the WHOLE trunk —
# identity blocks, the stride-2 projections (down2), ALL of layer1
# (projection + identity run) as ONE stage-fused call (hwncs1d; 'down1'
# is subsumed), and the siamese direction axis riding into the trunk
# as an interleaved batch via bitcasts (dirpack; siamese-only, no-op
# for single-direction apply). Measured (bench, 1620 pairs/step unless
# noted): +dirpack 5,530 (r4l, 2x, bit-exact hardware gate) > hwncs1d
# 5,384-5,425 > hwncs1 5,063 > hwnc+down1+down2 5,020 (1080/step, r4
# sessions, each 3x) > hwnc-only 4,470 (r3g) > pure-XLA v2 4,278 >
# identity(nhwc)+float inter-kernel IO 3,903.
# The hwnc kernels run on the (H, W, N, C) view whose row-major layout
# equals XLA's preferred conv layout {3,0,2,1}, so the XLA<->pallas
# boundary transposes are bitcasts, not relayout copies — that tax is
# what made the nhwc kernels lose to pure XLA. 'identity'/'down1'/
# 'hwncs1' stay available as explicit opt-ins; --no-pallas reproduces
# pure XLA.
_PALLAS_DEFAULT_V2 = frozenset(('hwnc', 'down2', 'hwncs1d', 'dirpack'))

# hwnc identity kernels win at every depth (zero boundary tax), so the
# default cap routes ALL stride-1 identity blocks through them.
_HWNC_CIN_CAP = 2048


def _apply_trunk_v2(q, cfg, h8, use_pallas=True, iden_cin_cap=None,
                    bt_budget=None, band_budget=None,
                    conv2_mode='im2col', hwnc_io='float', pipeline=False,
                    h8_hwnc=False, stage_unroll=1):
    """int8 stem output -> boundary-int8 trunk -> f32 head logits.

    hwnc_io: inter-pallas-kernel storage dtype — 'float' keeps the
    quantized integer values in the compute dtype between consecutive
    kernels (no packed-s8 sublane conversions; the measured round-3
    default), 's8' stores s8 everywhere (halves the inter-kernel HBM
    traffic at the cost of per-element pack/unpack on the VPU).

    h8_hwnc: the caller hands h8 already in the (H, W, N, C) view with
    a sublane-aligned (N % 8 == 0) batch — see the 'dirpack' path in
    apply_folded_v2_siamese."""
    from .folding import _pallas_features as shared
    from ..ops import pallas_blocks as _pb
    feats = shared(use_pallas, default=_PALLAS_DEFAULT_V2)
    if iden_cin_cap is not None:
        cap = iden_cin_cap
    elif feats & {'hwnc', 'hwncs', 'hwncs1', 'hwncs1d', 'hwncp'}:
        cap = _HWNC_CIN_CAP
    else:
        cap = _pb.IDEN_CIN_CAP
    groups = cfg['groups']
    assert cfg['block'] == 'bottleneck' and groups == 1, \
        'v2 path targets the resnet50 family'
    cdt = q['conv1']['w'].dtype

    blocks = [(li, bi, qb) for li in range(4)
              for bi, qb in enumerate(q[f'layer{li + 1}'])]

    def _kernel_ok(li, bi, qb):
        stride = 2 if (li > 0 and bi == 0) else 1
        if qb['conv1']['w'].shape[2] > cap:
            return False
        if stride != 1:
            # stride-2 projection (layer2/3/4[0]) — hwnc-only kernel
            return 'down2' in feats
        if 'down' in qb:
            # stride-1 projection (layer1[0]); 'hwncs1d' fuses it into
            # the layer1 stage kernel
            return ('down1' in feats or 'hwncs1d' in feats
                    or 'hwncp' in feats)
        return bool(feats & {'identity', 'hwnc', 'hwncs', 'hwncs1',
                             'hwncs1d', 'hwncp'})

    ok = [_kernel_ok(*b) for b in blocks]
    # 'hwnc': run identity kernels on the (H, W, N, C) view — its
    # row-major layout equals XLA's preferred {3,0,2,1}, so the
    # transposes at run boundaries are layout bitcasts, not copies.
    # 'hwncs': additionally fuse each RUN of consecutive identity
    # blocks into ONE pallas call with the activation VMEM-resident
    # across blocks (no inter-block HBM round trips).
    hwnc_on = bool(feats & {'hwnc', 'hwncs', 'hwncs1', 'hwncs1d',
                            'hwncp'})
    # the hwnc kernels ride the batch on the sublane-adjacent dim, so
    # Mosaic needs it 8-aligned (an unaligned N fails layout inference
    # on real hardware — interpret mode can't catch it); pad with zero
    # images and slice the pooled features back
    if h8_hwnc:
        n_in = h8.shape[2]
        assert n_in % 8 == 0, 'h8_hwnc callers must sublane-align N'
        is_t = True
    else:
        n_in = h8.shape[0]
        pad8 = (-n_in) % 8
        if hwnc_on and pad8 and any(ok):
            h8 = jnp.pad(h8, ((0, pad8),) + ((0, 0),) * (h8.ndim - 1))
        is_t = False
    k = 0
    while k < len(blocks):
        li, bi, qb = blocks[k]
        stride = 2 if (li > 0 and bi == 0) else 1
        # store int8 at boundaries that cross into XLA; between two
        # consecutive pallas kernels keep the SAME quantized integer
        # values in the compute dtype (0..127 exact in bf16) — the math
        # is identical, only the packed-s8 sublane conversions go away
        out_i8 = (hwnc_io == 's8'
                  or not (ok[k] and k + 1 < len(ok) and ok[k + 1]))
        # ...EXCEPT at layer1 size with a float input: a kernel whose
        # double-buffered in AND out windows are both bf16 at
        # (64, 64, B, 256) overflows the ~104.5M scoped-VMEM ceiling by
        # 716K (measured; s8 on either side fits) — emit s8 there
        if (not out_i8 and 'down' not in qb and h8.dtype != jnp.int8
                and int(np.prod(h8.shape)) // h8.shape[2 if is_t else 0]
                > 900_000):
            out_i8 = True
        if ok[k] and 'down' in qb and stride == 2:
            # stride-2 projection (layer2/3/4[0]) in the hwnc layout:
            # parity-plane conv2, replaces the XLA block + its s8
            # epilogue with zero boundary relayouts ('down2' feature)
            if not is_t:
                h8 = jnp.transpose(h8, (1, 2, 0, 3))
                is_t = True
            h8 = _pb.fused_bottleneck_down_s2_i8v2_hwnc(
                h8, qb['conv1']['w'][0, 0], qb['conv1']['b'],
                qb['conv2']['w'], qb['conv2']['b'],
                qb['conv3']['w'][0, 0], qb['conv3']['b'],
                qb['down']['w'][0, 0], qb['down']['b'],
                bt_budget=bt_budget, out_int8=out_i8,
                band_budget=band_budget)
            k += 1
            continue
        if ok[k] and 'down' in qb and hwnc_on:
            # stride-1 projection (layer1[0]) in the hwnc layout:
            # replaces the XLA block + its s8 epilogue with zero
            # boundary relayouts (gated on 'down1' via _kernel_ok)
            if not is_t:
                h8 = jnp.transpose(h8, (1, 2, 0, 3))
                is_t = True
            if 'hwncs1d' in feats or 'hwncp' in feats:
                # 'hwncs1d': ALL of layer1 — projection + identity run —
                # as ONE stage kernel with the projection output staged
                # in the 'act' scratch: the (64, 64, N, 256) s8 HBM
                # round trip between down1 and the hwncs1 stage run
                # (~2.8 ms at serving batch) disappears. s8 out forced
                # like hwncs1 (bf16 out window > scoped-VMEM ceiling).
                # 'hwncp': the same fusion on the parity-split view with
                # LANE-PACKED identity 3x3s (full 128-lane MXU width at
                # Cm=64 — the unpacked layer1 matmuls run at half).
                j = k + 1
                while (j < len(blocks) and ok[j]
                       and 'down' not in blocks[j][2]):
                    j += 1
                run = [blocks[i][2] for i in range(k + 1, j)]
                if run:
                    flat = [qb['conv1']['w'][0, 0], qb['conv1']['b'],
                            qb['conv2']['w'], qb['conv2']['b'],
                            qb['conv3']['w'][0, 0], qb['conv3']['b'],
                            qb['down']['w'][0, 0], qb['down']['b']]
                    for rqb in run:
                        flat += [rqb['conv1']['w'][0, 0],
                                 rqb['conv1']['b'],
                                 rqb['conv2']['w'], rqb['conv2']['b'],
                                 rqb['conv3']['w'][0, 0],
                                 rqb['conv3']['b']]
                    rs = jnp.stack([jnp.asarray(rqb['r'], jnp.float32)
                                    for rqb in run])
                    if 'hwncp' in feats:
                        h8 = _pb.fused_bottleneck_i8v2_hwncp_stage(
                            h8, *flat, rs, nblocks=len(run),
                            bt_budget=bt_budget, out_int8=True,
                            band_budget=band_budget,
                            unroll=stage_unroll)
                    else:
                        h8 = _pb.fused_bottleneck_i8v2_hwnc_stage(
                            h8, *flat, rs, nblocks=len(run), down=True,
                            bt_budget=bt_budget, out_int8=True,
                            staging='act', band_budget=band_budget)
                    k = j
                    continue
                # no fusable identity blocks after the projection (a
                # 1-block stage, or iden_cin_cap admits Cin=64 but
                # rejects the Cin=256 identities): fall through to the
                # per-block down kernel instead of a 0-block stage call
            if 'hwncs1' in feats:
                # the layer1 stage run that follows needs an s8 input
                # window to fit 'act' staging in scoped VMEM (see the
                # stage-fusion branch below)
                out_i8 = True
            h8 = _pb.fused_bottleneck_down_i8v2_hwnc(
                h8, qb['conv1']['w'][0, 0], qb['conv1']['b'],
                qb['conv2']['w'], qb['conv2']['b'],
                qb['conv3']['w'][0, 0], qb['conv3']['b'],
                qb['down']['w'][0, 0], qb['down']['b'],
                bt_budget=bt_budget, out_int8=out_i8,
                band_budget=band_budget, conv2_mode=conv2_mode)
            k += 1
            continue
        if ok[k] and 'down' not in qb and hwnc_on:
            if not is_t:
                h8 = jnp.transpose(h8, (1, 2, 0, 3))
                is_t = True
            # stage fusion pays only with zero-repack 'act' staging,
            # whose compute-dtype scratch fits scoped VMEM at layers
            # 2-4 but not at layer1's (64, 64, B, 256) tiles (measured:
            # 'out' staging there loses to per-block on s8<->bf16
            # sublane repacking; a bf16 scratch OOMs at 116.8M scoped)
            h, w = h8.shape[0], h8.shape[1]
            cin1 = qb['conv1']['w'].shape[2]
            act_fits = h * w * cin1 <= 600_000
            # 'hwncs1': stage-fuse layer1's identity pair TOO (where the
            # boundary traffic is biggest — the traced whale). Fits 'act'
            # staging at the B=8 tile the wrapper picks there IF both
            # run boundaries are s8 (the down1 branch above forces its
            # epilogue s8; run_out_i8 forced below): with a bf16 out
            # window the double-buffered grid measures 101.55M scoped
            # (> the 100M limit); s8 out drops it to ~84.8M. (The
            # round-3 exclusion measured 'out' staging pre-down-kernels.)
            if (('hwncs' in feats and act_fits)
                    or ('hwncs1' in feats and li == 0)):
                j = k
                while (j < len(blocks) and ok[j]
                       and 'down' not in blocks[j][2]):
                    j += 1
                run = [blocks[i][2] for i in range(k, j)]
                flat = []
                for rqb in run:
                    flat += [rqb['conv1']['w'][0, 0], rqb['conv1']['b'],
                             rqb['conv2']['w'], rqb['conv2']['b'],
                             rqb['conv3']['w'][0, 0], rqb['conv3']['b']]
                rs = jnp.stack([jnp.asarray(rqb['r'], jnp.float32)
                                for rqb in run])
                run_out_i8 = not (j < len(ok) and ok[j])
                if li == 0:
                    # layer1: a bf16 out window pushes the stage
                    # kernel's scoped VMEM to 101.55M > the 100M limit
                    # once the grid double-buffers (measured on-device;
                    # N=8/grid=1 compiles, N=360/grid=45 does not) —
                    # emit s8, like the per-block path's forced-s8 rule
                    run_out_i8 = True
                h8 = _pb.fused_bottleneck_i8v2_hwnc_stage(
                    h8, *flat, rs, nblocks=len(run),
                    bt_budget=bt_budget, out_int8=run_out_i8,
                    staging='act')
                k = j
                continue
            h8 = _pb.fused_bottleneck_i8v2_hwnc(
                h8, qb['conv1']['w'][0, 0], qb['conv1']['b'],
                qb['conv2']['w'], qb['conv2']['b'],
                qb['conv3']['w'][0, 0], qb['conv3']['b'], qb['r'],
                bt_budget=bt_budget, out_int8=out_i8,
                band_budget=band_budget, conv2_mode=conv2_mode,
                pipeline=pipeline)
            k += 1
            continue
        if is_t:
            h8 = jnp.transpose(h8, (2, 0, 1, 3))
            is_t = False
        if ok[k] and 'down' in qb:
            h8 = _pb.fused_bottleneck_down_i8v2(
                h8, qb['conv1']['w'][0, 0], qb['conv1']['b'],
                qb['conv2']['w'], qb['conv2']['b'],
                qb['conv3']['w'][0, 0], qb['conv3']['b'],
                qb['down']['w'][0, 0], qb['down']['b'],
                bt_budget=bt_budget, out_int8=out_i8)
            k += 1
            continue
        if ok[k]:
            h8 = _pb.fused_bottleneck_i8v2(
                h8, qb['conv1']['w'][0, 0], qb['conv1']['b'],
                qb['conv2']['w'], qb['conv2']['b'],
                qb['conv3']['w'][0, 0], qb['conv3']['b'], qb['r'],
                bt_budget=bt_budget, out_int8=out_i8)
            k += 1
            continue
        xb = h8.astype(cdt)
        h = jnp.maximum(cnn.conv2d(qb['conv1'], xb), 0.0).astype(cdt)
        h = jnp.maximum(cnn.conv2d(qb['conv2'], h, stride=stride,
                                   padding=1), 0.0).astype(cdt)
        y = cnn.conv2d(qb['conv3'], h)
        if 'down' in qb:
            iden = cnn.conv2d(qb['down'], xb, stride=stride)
        else:
            iden = xb.astype(jnp.float32) * qb['r']
        h8 = _q8(y + iden)
        k += 1
    feat = h8.astype(jnp.float32) * q['s_feat']
    pooled = jnp.mean(feat, axis=(0, 1) if is_t else (1, 2))[:n_in]
    if cfg['dual_head']:
        return (cnn.linear(q['fc_occ'], pooled),
                cnn.linear(q['fc_depth'], pooled))
    return cnn.linear(q['fc'], pooled)


def apply_folded_v2(q, cfg, x, use_pallas=True, stem_chunks=1,
                    iden_cin_cap=None, bt_budget=None, band_budget=None,
                    conv2_mode='im2col', hwnc_io='float', pipeline=False,
                    stage_unroll=1):
    """Unquantized prep output -> boundary-int8 trunk -> f32 logits."""
    h8 = _stem_v2(q, x, chunks=stem_chunks, use_pallas=use_pallas)
    return _apply_trunk_v2(q, cfg, h8, use_pallas=use_pallas,
                           iden_cin_cap=iden_cin_cap, bt_budget=bt_budget,
                           band_budget=band_budget, conv2_mode=conv2_mode,
                           hwnc_io=hwnc_io, pipeline=pipeline,
                           stage_unroll=stage_unroll)


def apply_folded_v2_siamese(q, cfg, x, use_pallas=True, stem_chunks=1,
                            iden_cin_cap=None, bt_budget=None,
                            band_budget=None, conv2_mode='im2col',
                            hwnc_io='float', pipeline=False,
                            stage_unroll=1):
    """Both swap directions via the folded-conv1 trick
    (models/folding.py:95-140): conv1(swap(x)) == conv1'(x) with input
    channel rows 0,1 exchanged."""
    from .folding import swap_conv1_w
    conv1_sw = dict(q['conv1'], w=swap_conv1_w(q['conv1']['w']))
    # double-width stem: both directions' conv1 weights concatenated on
    # the output-channel axis — ONE conv reads the input once at full
    # 128-lane MXU width, then the channel halves become the two batch
    # halves (the two separate 64-wide stems each ran the MXU at 50%
    # width and read the 256^2 input twice; trace: 2x3.84 + 2x2.56 ms)
    wcat = jnp.concatenate([q['conv1']['w'], conv1_sw['w']], axis=3)
    bcat = jnp.concatenate([q['conv1']['b'], conv1_sw['b']])
    hcat = _stem_v2(dict(q, conv1={'w': wcat, 'b': bcat}), x,
                    chunks=stem_chunks, use_pallas=use_pallas)
    c = hcat.shape[-1] // 2
    n = x.shape[0]
    from .folding import _pallas_features as _feats
    feats = _feats(use_pallas, default=_PALLAS_DEFAULT_V2)
    hwnc_on = bool(feats & {'hwnc', 'hwncs', 'hwncs1', 'hwncs1d',
                            'hwncp'})
    if 'dirpack' in feats and hwnc_on:
        # Direction axis -> batch via BITCASTS. The pooled stem output
        # [N, 64, 64, 2*Cs] lives in XLA's {3,0,2,1} conv layout, so
        # the transpose to the (H, W, N, C) view the hwnc trunk wants
        # is a layout bitcast, and the row-major reshape
        # [H, W, N, 2*Cs] -> [H, W, 2N, Cs] then interleaves the two
        # direction halves into the batch (item 2i = dir0 of pair i,
        # 2i+1 = dir1) for free. This replaces the channel-split +
        # batch-concat fusions of the default path — 3.5 ms/step of
        # pure data movement at 540 pairs (trace_r4_hwncs1d.txt,
        # fusion.217 + add_bitcast_fusion). Trunk math is batch-
        # independent in N, so the reorder is bit-exact.
        # The hwnc kernels need a sublane-aligned (2n % 8 == 0) batch;
        # pad the PAIR axis to a multiple of 4 with zero images (one
        # tiny pad fusion on the stem output; the bench's 1650-pair
        # step would otherwise silently skip this path).
        pad4 = (-n) % 4
        hp = jnp.pad(hcat, ((0, pad4),) + ((0, 0),) * 3) if pad4 \
            else hcat
        ht = jnp.transpose(hp, (1, 2, 0, 3))
        h8 = ht.reshape(ht.shape[0], ht.shape[1], 2 * (n + pad4), c)
        out = _apply_trunk_v2(q, cfg, h8, use_pallas=use_pallas,
                              iden_cin_cap=iden_cin_cap,
                              bt_budget=bt_budget,
                              band_budget=band_budget,
                              conv2_mode=conv2_mode, hwnc_io=hwnc_io,
                              pipeline=pipeline, h8_hwnc=True,
                              stage_unroll=stage_unroll)
        if isinstance(out, tuple):
            outs = tuple(o.reshape(n + pad4, 2, *o.shape[1:])[:n]
                         for o in out)
            return (tuple(o[:, 0] for o in outs),
                    tuple(o[:, 1] for o in outs))
        o = out.reshape(n + pad4, 2, *out.shape[1:])[:n]
        return o[:, 0], o[:, 1]
    h8 = jnp.concatenate([hcat[..., :c], hcat[..., c:]], axis=0)
    out = _apply_trunk_v2(q, cfg, h8, use_pallas=use_pallas,
                          iden_cin_cap=iden_cin_cap, bt_budget=bt_budget,
                          band_budget=band_budget, conv2_mode=conv2_mode,
                          hwnc_io=hwnc_io, pipeline=pipeline,
                          stage_unroll=stage_unroll)
    if isinstance(out, tuple):
        return tuple(o[:n] for o in out), tuple(o[n:] for o in out)
    return out[:n], out[n:]


def apply_folded_int8_siamese(q, cfg, x, use_pallas=True, stem_chunks=1,
                              conv2_mode='im2col', pipeline=False):
    """Both swap directions without a swapped input copy (the folded-bf16
    trick, models/folding.py:54-85): conv1(swap(x)) == conv1'(x) with
    input-channel rows 0,1 exchanged."""
    from .folding import swap_conv1_w
    conv1_sw = dict(q['conv1'], w=swap_conv1_w(q['conv1']['w']))
    x8 = quantize_input(x, q['cfg_scales']['in'])
    # double-width stem (see apply_folded_v2_siamese): both directions'
    # conv1 concatenated on the output-channel axis — per-channel m/b
    # concatenate the same way, so one conv reads x8 once at full MXU
    # width and the channel halves become the batch halves
    wide = dict(q, conv1={
        'w': jnp.concatenate([q['conv1']['w'], conv1_sw['w']], axis=3),
        'm': jnp.concatenate([q['conv1']['m'], conv1_sw['m']]),
        'b': jnp.concatenate([q['conv1']['b'], conv1_sw['b']]),
    })
    hcat = _stem_int8(wide, x8, use_pallas=use_pallas,
                      chunks=stem_chunks)
    c = hcat.shape[-1] // 2
    h8 = jnp.concatenate([hcat[..., :c], hcat[..., c:]], axis=0)
    out = _apply_trunk_int8(q, cfg, h8, use_pallas=use_pallas,
                            conv2_mode=conv2_mode, pipeline=pipeline)
    n = x.shape[0]
    if isinstance(out, tuple):
        return tuple(o[:n] for o in out), tuple(o[n:] for o in out)
    return out[:n], out[n:]
