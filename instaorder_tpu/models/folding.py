"""Inference-time BatchNorm folding.

Eval-mode BN is an affine map, so it folds into the preceding conv:
  w' = w * gamma / sqrt(var + eps)      (per output channel)
  b' = beta - mean * gamma / sqrt(var + eps)
This removes every BN op from the serving graph — one conv+bias(+relu)
fusion per layer on the MXU instead of conv -> normalize -> scale chains.
The reference has no analogue (it serves train-built graphs); this is a
TPU-serving optimisation that leaves eval outputs bit-identical up to fp
reassociation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import nn as cnn


def _fold(conv_p, bn_p, bn_s, eps=1e-5):
    scale = bn_p['scale'] * jax.lax.rsqrt(bn_s['var'] + eps)
    w = conv_p['w'] * scale  # HWIO: broadcast over output channel (last)
    b = bn_p['bias'] - bn_s['mean'] * scale
    if 'b' in conv_p:
        b = b + conv_p['b'] * scale
    return {'w': w, 'b': b}


def fold_resnet(params, stats, cfg):
    """ResNet params+stats -> folded conv-only params for
    `apply_folded`."""
    out = {'conv1': _fold(params['conv1'], params['bn1'], stats['bn1'])}
    for li, blocks in enumerate(cfg['layers']):
        name = f'layer{li + 1}'
        stage = []
        for bp, bs in zip(params[name], stats[name]):
            fb = {}
            n_convs = 3 if cfg['block'] == 'bottleneck' else 2
            for ci in range(1, n_convs + 1):
                fb[f'conv{ci}'] = _fold(bp[f'conv{ci}'], bp[f'bn{ci}'],
                                        bs[f'bn{ci}'])
            if 'down_conv' in bp:
                fb['down'] = _fold(bp['down_conv'], bp['down_bn'],
                                   bs['down_bn'])
            stage.append(fb)
        out[name] = stage
    for fc in ('fc', 'fc_occ', 'fc_depth'):
        if fc in params:
            out[fc] = params[fc]
    return out


# pallas feature sets for `use_pallas`: True/'default' = the measured-best
# mix; a tuple/set from _PALLAS_VOCAB picks kernels explicitly.
# bf16 A/B (bench, 1080 pairs/step): identity-only 3661 > identity+down
# 3342 > +stem 2999 pairs/s — the XLA-side space-to-depth copies feeding
# the stride-2 kernels cost more than their VMEM residency saves.
_PALLAS_VOCAB = frozenset(('identity', 'stage', 'sstage', 'down', 'down1',
                           'down2', 'stem', 'stem2', 'qpool', 'hwnc',
                           'hwncs', 'hwncs1', 'hwncs1d', 'hwncp',
                           'dirpack'))
_PALLAS_DEFAULT = frozenset(('identity',))


def _pallas_features(use_pallas, default=_PALLAS_DEFAULT):
    if not use_pallas:
        return frozenset()
    if use_pallas is True or use_pallas == 'default':
        return default
    feats = frozenset(use_pallas)
    unknown = feats - _PALLAS_VOCAB
    if unknown:
        raise ValueError(f'unknown pallas feature(s) {sorted(unknown)}; '
                         f'valid: {sorted(_PALLAS_VOCAB)}')
    return feats


def swap_conv1_w(w):
    """conv1 weights with input-channel rows 0,1 exchanged (HWIO axis
    2): conv1(swap(x)) == conv1'(x) for the pair-mask channel swap —
    the ONE place the mask order enters any net. Shared by every
    siamese fold (bf16/v2/int8c paths, the Tester's weight-permuted
    forward, tests)."""
    perm = [1, 0] + list(range(2, w.shape[2]))
    return w[:, :, perm, :]


def s2d_conv1_w(w):
    """The 7x7/stride-2 stem conv re-expressed over a 2x2 space-to-depth
    input ('stem2'): the MXU runs the stock stem at ~26% of peak because
    Cin=5 starves the contraction dim (trace_r4_default.txt: 6.6 ms for
    a 1.7 ms-at-peak conv). S2D quadruples Cin (5 -> 20) and shrinks the
    kernel to 4x4 stride 1 — same taps, same math, MXU-shaped.

    Derivation: out(i) = sum_ky w[ky] * x[2i + ky - 3]. With the input
    padded (4, 2) and S2D'd as x2[u, (sy, c)] = xpad[2u + sy], the tap
    ky = 2*du + sy - 1 lands at x2[i + du], du in 0..3 — so
    w2[du, dxu, (sy, sx, c)] = w[2du+sy-1, 2dxu+sx-1, c] (zero where the
    index leaves 0..6, i.e. the (du=0, sy=0) row/col)."""
    C, Co = w.shape[2], w.shape[3]
    wp = jnp.pad(w, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(4, 2, 4, 2, C, Co).transpose(0, 2, 1, 3, 4, 5)
    return w2.reshape(4, 4, 4 * C, Co)


def s2d_stem_input(x):
    """Pad (4, 2)x(4, 2) and 2x2 space-to-depth: (N, H, W, C) ->
    (N, H/2 + 3, W/2 + 3, 4C), lane order (sy, sx, c) to match
    s2d_conv1_w. Requires even H, W. A VALID 4x4 stride-1 conv of
    s2d_conv1_w(w) over this equals conv2d(w, x, stride=2, padding=3)
    term-for-term."""
    n, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
    x2 = xp.reshape(n, (H + 6) // 2, 2, (W + 6) // 2, 2, C)
    return x2.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, (H + 6) // 2, (W + 6) // 2, 4 * C)


def _xla_stem(conv1, x, chunks=1):
    """conv1 7x7/2 + relu + maxpool in XLA. chunks > 1 bounds the
    transient (N, H/2, W/2, 64) conv output (lane-padded it is 2x 4GB at
    serving batch — enough to OOM HBM when two siamese stems are live)
    by processing the batch in `chunks` sequential slices."""
    def stem(xc):
        h = jax.nn.relu(cnn.conv2d(conv1, xc, stride=2, padding=3))
        return cnn.max_pool(h, 3, 2, 1)
    n = x.shape[0]
    while chunks > 1 and n % chunks:
        chunks -= 1  # largest divisor <= requested keeps the bound
    if chunks <= 1:
        return stem(x)
    xs = x.reshape(chunks, n // chunks, *x.shape[1:])
    return jax.lax.map(stem, xs).reshape(n, x.shape[1] // 4,
                                         x.shape[2] // 4, -1)


def apply_folded_siamese(params, cfg, x, dtype=None, use_pallas=False,
                         stem_chunks=1, iden_cin_cap=None,
                         bt_budget=None):
    """Both swap directions WITHOUT materialising a swapped input copy.

    Pass 2's input is pass 1's with mask channels 0,1 exchanged, so
    conv1(swap(x)) == conv1'(x) where conv1' has its input-channel rows
    0,1 swapped (HWIO axis 2). We run the stem with both weights on the
    same x, concat at the stem output, and run the trunk once on the 2N
    batch — saving a full copy of the (large) input batch in HBM.

    use_pallas: False, True (measured-best kernel mix) or an explicit
    feature collection from {'identity', 'stage', 'down', 'down1',
    'stem'} ('down1' = stride-1 projection blocks only, avoiding the
    space-to-depth transform the stride-2 kernels need).
    stem_chunks: sequential batch chunks for the XLA stem (bounds HBM
    liveness at large serving batches; ignored by the pallas stem).
    iden_cin_cap / bt_budget: explicit overrides for the module-global
    kernel-tuning defaults (ops/pallas_blocks.IDEN_CIN_CAP/BT_BUDGET),
    which are only read at trace time.

    Returns (out1, out2)."""
    feats = _pallas_features(use_pallas)
    swapped_conv1 = {'w': swap_conv1_w(params['conv1']['w']),
                     'b': params['conv1']['b']}
    if dtype is not None:
        x = x.astype(dtype)
        params = cnn.tree_cast(params, dtype)
        swapped_conv1 = cnn.tree_cast(swapped_conv1, dtype)
    if 'stem' in feats and _stem_fusable(params['conv1']['w'], x):
        # VMEM-resident stem (mod-4 parity planes). Correct but measured
        # slower than the XLA stem (the pack transpose costs as much as
        # the stem itself) — off by default; chunked XLA stem handles
        # the HBM-liveness problem instead.
        from ..ops.pallas_blocks import fused_stem
        # double-width here too: one kernel call, input packed once
        wcat = jnp.concatenate([params['conv1']['w'],
                                swapped_conv1['w']], axis=3)
        bcat = jnp.concatenate([params['conv1']['b'],
                                swapped_conv1['b']])
        hcat = fused_stem(x, wcat, bcat)
        c = hcat.shape[-1] // 2
        h = jnp.concatenate([hcat[..., :c], hcat[..., c:]], axis=0)
    else:
        # double-width stem: both directions' conv1 concatenated on the
        # output-channel axis — one conv reads the input once at full
        # 128-lane MXU width; the channel halves become the batch halves
        wcat = jnp.concatenate([params['conv1']['w'],
                                swapped_conv1['w']], axis=3)
        bcat = jnp.concatenate([params['conv1']['b'],
                                swapped_conv1['b']])
        hcat = _xla_stem({'w': wcat, 'b': bcat}, x, chunks=stem_chunks)
        c = hcat.shape[-1] // 2
        h = jnp.concatenate([hcat[..., :c], hcat[..., c:]], axis=0)
    out = _apply_trunk(params, cfg, h, use_pallas=use_pallas,
                       iden_cin_cap=iden_cin_cap, bt_budget=bt_budget)
    if isinstance(out, tuple):
        n = x.shape[0]
        return tuple(o[:n] for o in out), tuple(o[n:] for o in out)
    n = x.shape[0]
    return out[:n], out[n:]


def _apply_trunk(params, cfg, out, use_pallas=False, iden_cin_cap=None,
                 bt_budget=None):
    """Post-stem trunk + head(s) of the folded ResNet (NHWC).

    use_pallas (bool or feature collection, see apply_folded_siamese):
    'identity' routes stride-1 identity-skip bottleneck blocks through the
    fused VMEM-resident Pallas kernel; 'down' routes the projection
    blocks through fused_bottleneck_down."""
    feats = _pallas_features(use_pallas)
    block = cfg['block']
    groups = cfg['groups']
    # 'hwnc': run identity blocks in the layout-native kernel on the
    # (H, W, N, C) view — entering/leaving is a layout bitcast, not a
    # copy (see ops/pallas_blocks.fused_bottleneck_hwnc). `is_t` tracks
    # whether `out` currently holds the transposed view.
    is_t = False
    from ..ops import pallas_blocks as _pb
    cap = _pb.IDEN_CIN_CAP if iden_cin_cap is None else iden_cin_cap

    def _iden_ok(p):
        return (block == 'bottleneck' and groups == 1 and
                'down' not in p and
                p['conv1']['w'].shape[2] <= cap)

    for li in range(4):
        blocks = params[f'layer{li + 1}']
        bi = 0
        while bi < len(blocks):
            bp = blocks[bi]
            stride = 2 if (li > 0 and bi == 0) else 1
            # single-block kernel restricted to the early high-traffic
            # stages: measured best (3901 pairs/s vs 3853 XLA vs 3782 for
            # the whole-stage variant whose resident weight stacks at
            # layer3/4 hurt pipelining)
            if 'hwnc' in feats and stride == 1 and _iden_ok(bp):
                if not is_t:
                    out = jnp.transpose(out, (1, 2, 0, 3))
                    is_t = True
                out = _pb.fused_bottleneck_hwnc(
                    out,
                    bp['conv1']['w'][0, 0], bp['conv1']['b'],
                    bp['conv2']['w'], bp['conv2']['b'],
                    bp['conv3']['w'][0, 0], bp['conv3']['b'])
                bi += 1
                continue
            if is_t:
                out = jnp.transpose(out, (2, 0, 1, 3))
                is_t = False
            if (('stage' in feats or 'sstage' in feats) and
                    stride == 1 and _iden_ok(bp)):
                # whole-stage residency: run the consecutive identity
                # blocks of this layer in ONE kernel (inter-block
                # activations never touch HBM)
                run = [bp]
                while bi + len(run) < len(blocks) and _iden_ok(
                        blocks[bi + len(run)]):
                    run.append(blocks[bi + len(run)])
                if len(run) == 1:
                    out = _pb.fused_bottleneck(
                        out,
                        bp['conv1']['w'][0, 0], bp['conv1']['b'],
                        bp['conv2']['w'], bp['conv2']['b'],
                        bp['conv3']['w'][0, 0], bp['conv3']['b'],
                        bt_budget=bt_budget)
                else:
                    stage_fn = (_pb.fused_bottleneck_stage_stream
                                if 'sstage' in feats
                                else _pb.fused_bottleneck_stage)
                    out = stage_fn(
                        out,
                        jnp.stack([p['conv1']['w'][0, 0] for p in run]),
                        jnp.stack([p['conv1']['b'] for p in run]),
                        jnp.stack([p['conv2']['w'] for p in run]),
                        jnp.stack([p['conv2']['b'] for p in run]),
                        jnp.stack([p['conv3']['w'][0, 0] for p in run]),
                        jnp.stack([p['conv3']['b'] for p in run]),
                        bt_budget=bt_budget)
                bi += len(run)
                continue
            fusable = ('identity' in feats and stride == 1 and
                       _iden_ok(bp))
            if fusable:
                out = _pb.fused_bottleneck(
                    out,
                    bp['conv1']['w'][0, 0], bp['conv1']['b'],
                    bp['conv2']['w'], bp['conv2']['b'],
                    bp['conv3']['w'][0, 0], bp['conv3']['b'],
                    bt_budget=bt_budget)
                bi += 1
                continue
            fusable_down = (('down' in feats or
                             ('down1' in feats and stride == 1)) and
                            block == 'bottleneck' and
                            groups == 1 and 'down' in bp
                            and bp['conv1']['w'].shape[2] <= cap)
            if fusable_down:
                out = _pb.fused_bottleneck_down(
                    out,
                    bp['conv1']['w'][0, 0], bp['conv1']['b'],
                    bp['conv2']['w'], bp['conv2']['b'],
                    bp['conv3']['w'][0, 0], bp['conv3']['b'],
                    bp['down']['w'][0, 0], bp['down']['b'], stride=stride)
                bi += 1
                continue
            identity = out
            if block == 'bottleneck':
                h = jax.nn.relu(cnn.conv2d(bp['conv1'], out))
                h = jax.nn.relu(cnn.conv2d(bp['conv2'], h, stride=stride,
                                           padding=1, groups=groups))
                h = cnn.conv2d(bp['conv3'], h)
            else:
                h = jax.nn.relu(cnn.conv2d(bp['conv1'], out, stride=stride,
                                           padding=1))
                h = cnn.conv2d(bp['conv2'], h, padding=1)
            if 'down' in bp:
                identity = cnn.conv2d(bp['down'], out, stride=stride)
            out = jax.nn.relu(h + identity)
            bi += 1
    pooled = jnp.mean(out, axis=(0, 1) if is_t else (1, 2),
                      dtype=jnp.float32)
    if cfg['dual_head']:
        return (cnn.linear(cnn.tree_cast(params['fc_occ'], jnp.float32),
                           pooled),
                cnn.linear(cnn.tree_cast(params['fc_depth'], jnp.float32),
                           pooled))
    return cnn.linear(cnn.tree_cast(params['fc'], jnp.float32), pooled)


def apply_folded(params, cfg, x, dtype=None, use_pallas=False,
                 stem_chunks=1, iden_cin_cap=None, bt_budget=None):
    """Lean inference forward for folded ResNet params (NHWC).

    dtype: compute dtype (e.g. jnp.bfloat16 for the serving fast path);
    params are cast on the fly, logits return in float32.
    """
    if dtype is not None:
        x = x.astype(dtype)
        params = cnn.tree_cast(params, dtype)
    feats = _pallas_features(use_pallas)
    if 'stem' in feats and _stem_fusable(params['conv1']['w'], x):
        from ..ops.pallas_blocks import fused_stem
        out = fused_stem(x, params['conv1']['w'], params['conv1']['b'])
    else:
        out = _xla_stem(params['conv1'], x, chunks=stem_chunks)
    return _apply_trunk(params, cfg, out, use_pallas=use_pallas,
                        iden_cin_cap=iden_cin_cap, bt_budget=bt_budget)


def _stem_fusable(w, x):
    """fused_stem covers the standard ResNet stem: 7x7, stride 2 + 3x3/2
    maxpool, spatial dims divisible by 4."""
    return (w.shape[0] == 7 and w.shape[1] == 7 and
            x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0)
