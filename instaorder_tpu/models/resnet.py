"""ResNet / ResNeXt / WideResNet classifier family, TPU-native.

Capability parity with the reference's `models/backbone/resnet_cls.py`
(torchvision-style ResNet with two InstaOrder extensions, resnet_cls.py:121,
153-158):
  * configurable `in_channels` (5 = mask1 + mask2 + RGB)
  * `num_classes` may be a list -> two FC heads (fc_occ, fc_depth)

and with `models/backbone/resnet.py` (headless feature-extractor variant
used by UNetResNet / the InstaDepthNet mask branches) via `features=True`
apply mode, which returns the post-stage feature maps.

Everything is NHWC and functional: `init` builds the param/stat pytrees,
`apply` is a pure function suitable for jit/pjit. The stage layout is
data-driven from ARCHS, not an object graph.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import nn as cnn

# arch name -> (block, layers, groups, width_per_group)
ARCHS = {
    'resnet18': ('basic', (2, 2, 2, 2), 1, 64),
    'resnet34': ('basic', (3, 4, 6, 3), 1, 64),
    'resnet50': ('bottleneck', (3, 4, 6, 3), 1, 64),
    'resnet101': ('bottleneck', (3, 4, 23, 3), 1, 64),
    'resnet152': ('bottleneck', (3, 8, 36, 3), 1, 64),
    'resnext50_32x4d': ('bottleneck', (3, 4, 6, 3), 32, 4),
    'resnext101_32x8d': ('bottleneck', (3, 4, 23, 3), 32, 8),
    'wide_resnet50_2': ('bottleneck', (3, 4, 6, 3), 1, 128),
    'wide_resnet101_2': ('bottleneck', (3, 4, 23, 3), 1, 128),
}

_EXPANSION = {'basic': 1, 'bottleneck': 4}


def _block_init(key, block, cin, planes, stride, groups, base_width,
                dilation, init, gain):
    """Parameters for one residual block (+ optional downsample)."""
    exp = _EXPANSION[block]
    ks = cnn.split_keys(key, 8)
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    if block == 'bottleneck':
        width = int(planes * (base_width / 64.0)) * groups
        p['conv1'] = cnn.conv_init(ks[0], 1, 1, cin, width, init=init, gain=gain)
        p['bn1'], s['bn1'] = cnn.bn_init(width)
        p['conv2'] = cnn.conv_init(ks[1], 3, 3, width, width, groups=groups,
                                   init=init, gain=gain)
        p['bn2'], s['bn2'] = cnn.bn_init(width)
        p['conv3'] = cnn.conv_init(ks[2], 1, 1, width, planes * exp,
                                   init=init, gain=gain)
        p['bn3'], s['bn3'] = cnn.bn_init(planes * exp)
    else:
        p['conv1'] = cnn.conv_init(ks[0], 3, 3, cin, planes, init=init, gain=gain)
        p['bn1'], s['bn1'] = cnn.bn_init(planes)
        p['conv2'] = cnn.conv_init(ks[1], 3, 3, planes, planes, init=init, gain=gain)
        p['bn2'], s['bn2'] = cnn.bn_init(planes)
    if stride != 1 or cin != planes * exp:
        p['down_conv'] = cnn.conv_init(ks[3], 1, 1, cin, planes * exp,
                                       init=init, gain=gain)
        p['down_bn'], s['down_bn'] = cnn.bn_init(planes * exp)
    return p, s


def _vmask(x, valid_hw):
    """Zero everything beyond the (vh, vw) valid region. valid_hw may be
    python ints or traced int32 scalars (dynamic: one compiled program
    serves every valid size within a padded bucket)."""
    if valid_hw is None:
        return x
    vh, vw = valid_hw
    h, w = x.shape[1], x.shape[2]
    if isinstance(vh, int) and isinstance(vw, int) and vh >= h and vw >= w:
        return x
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    m = (rows < vh) & (cols < vw)
    return jnp.where(m, x, jnp.zeros((), x.dtype))


def _block_apply(p, s, x, block, stride, groups, dilation, train,
                 valid_hw=None):
    """valid_hw: static (vh, vw) valid region of x for padded-bucket
    eval (see `apply`). Invariant: x is zero beyond it. Masking the
    input of every spatial (3x3) conv and the block output makes the
    result on the valid region bit-equal to an exact-size run — the
    zeros the spatial convs read across the boundary are exactly the
    implicit zero padding of the exact-size conv."""
    new_s = {}
    identity = x
    out_hw = (None if valid_hw is None
              else (valid_hw[0] // stride, valid_hw[1] // stride))
    if block == 'bottleneck':
        out = cnn.conv2d(p['conv1'], x)
        out, new_s['bn1'] = cnn.batch_norm(p['bn1'], s['bn1'], out, train)
        out = _vmask(jax.nn.relu(out), valid_hw)  # conv2 is 3x3
        out = cnn.conv2d(p['conv2'], out, stride=stride, padding=dilation,
                         groups=groups, dilation=dilation)
        out, new_s['bn2'] = cnn.batch_norm(p['bn2'], s['bn2'], out, train)
        out = jax.nn.relu(out)
        out = cnn.conv2d(p['conv3'], out)
        out, new_s['bn3'] = cnn.batch_norm(p['bn3'], s['bn3'], out, train)
    else:
        out = cnn.conv2d(p['conv1'], x, stride=stride, padding=1)
        out, new_s['bn1'] = cnn.batch_norm(p['bn1'], s['bn1'], out, train)
        out = _vmask(jax.nn.relu(out), out_hw)  # conv2 is 3x3
        out = cnn.conv2d(p['conv2'], out, padding=1)
        out, new_s['bn2'] = cnn.batch_norm(p['bn2'], s['bn2'], out, train)
    if 'down_conv' in p:
        identity = cnn.conv2d(p['down_conv'], x, stride=stride)
        identity, new_s['down_bn'] = cnn.batch_norm(
            p['down_bn'], s['down_bn'], identity, train)
    return _vmask(jax.nn.relu(out + identity), out_hw), new_s


def init(key, arch='resnet50', in_channels=3, num_classes=1000,
         weight_init='kaiming_out', gain=0.02, with_head=True,
         layers_override=None):
    """Build (params, stats, static_cfg) for a ResNet classifier.

    weight_init: 'kaiming_out' (torchvision constructor default) or
    'xavier' with gain (the reference applies init_weights(..., 'xavier')
    with gain 0.02 on top for scratch training, common_utils.py:35-65 +
    single_stage_model.py:25 — pass weight_init='xavier').
    """
    block, layers, groups, base_width = ARCHS[arch]
    if layers_override is not None:
        layers = tuple(layers_override)
    exp = _EXPANSION[block]
    keys = iter(cnn.split_keys(key, 4 + sum(layers) + 2))
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p['conv1'] = cnn.conv_init(next(keys), 7, 7, in_channels, 64,
                               init=weight_init, gain=gain)
    p['bn1'], s['bn1'] = cnn.bn_init(64)
    cin = 64
    for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
        stage_p, stage_s = [], []
        for bi in range(blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            bp, bs = _block_init(next(keys), block, cin, planes, stride,
                                 groups, base_width, 1, weight_init, gain)
            cin = planes * exp
            stage_p.append(bp)
            stage_s.append(bs)
        p[f'layer{li + 1}'] = stage_p
        s[f'layer{li + 1}'] = stage_s
    feat_dim = 512 * exp
    if with_head:
        if isinstance(num_classes, (list, tuple)):
            p['fc_occ'] = cnn.linear_init(next(keys), feat_dim, num_classes[0],
                                          init=weight_init if weight_init == 'xavier' else 'torch_default',
                                          gain=gain)
            p['fc_depth'] = cnn.linear_init(next(keys), feat_dim, num_classes[1],
                                            init=weight_init if weight_init == 'xavier' else 'torch_default',
                                            gain=gain)
        else:
            p['fc'] = cnn.linear_init(next(keys), feat_dim, num_classes,
                                      init=weight_init if weight_init == 'xavier' else 'torch_default',
                                      gain=gain)
    cfg = {'arch': arch, 'block': block, 'layers': layers, 'groups': groups,
           'base_width': base_width, 'feat_dim': feat_dim,
           'dual_head': isinstance(num_classes, (list, tuple))}
    return p, s, cfg


def apply(params, stats, cfg, x, train=False, features=False,
          valid_hw=None):
    """Forward. x: (N, H, W, C).

    Returns (out, new_stats). out is logits (or an (occ, depth) tuple for
    dual heads); with features=True, out is a dict of stage outputs
    {stem, layer1..4, pooled} — the headless `models/backbone/resnet.py`
    behavior plus what the MiDaS fusion branches consume.

    valid_hw: static (vh, vw), multiples of 32, for padded-bucket eval
    (eval/pipeline.py 'orig' mode): x is zero beyond [:vh, :vw] and the
    logits equal an exact-size (vh, vw) run — spatial convs at the
    boundary read the re-zeroed pad region exactly like their implicit
    zero padding, and the global pool averages the valid region only.
    Eval-mode only (train batch stats would mix in the pad region).
    """
    block = cfg['block']
    groups = cfg['groups']
    if valid_hw is not None:
        assert not train, 'valid_hw is an eval-only (static-stats) path'
        if isinstance(valid_hw[0], int):
            assert valid_hw[0] % 32 == 0 and valid_hw[1] % 32 == 0, valid_hw
    new_stats: Dict[str, Any] = {}
    out = cnn.conv2d(params['conv1'], x, stride=2, padding=3)
    out, new_stats['bn1'] = cnn.batch_norm(params['bn1'], stats['bn1'], out,
                                           train)
    out = jax.nn.relu(out)
    # post-relu values are >= 0, so zeroed pad rows cannot win the
    # maxpool over a valid window
    vhw = None
    if valid_hw is not None:
        out = _vmask(out, (valid_hw[0] // 2, valid_hw[1] // 2))
        vhw = (valid_hw[0] // 4, valid_hw[1] // 4)
    out = cnn.max_pool(out, 3, 2, 1)
    # the pool's first pad row taps the last valid row (window pad 1),
    # so re-zero to keep the invariant for 3x3 convs reading the stem
    out = _vmask(out, vhw)
    feats = {'stem': out}
    for li in range(4):
        name = f'layer{li + 1}'
        stage_new = []
        for bi, (bp, bs) in enumerate(zip(params[name], stats[name])):
            stride = 2 if (li > 0 and bi == 0) else 1
            out, bns = _block_apply(bp, bs, out, block, stride, groups, 1,
                                    train, valid_hw=vhw)
            if vhw is not None:
                vhw = (vhw[0] // stride, vhw[1] // stride)
            stage_new.append(bns)
        new_stats[name] = stage_new
        feats[name] = out
    if vhw is None:
        pooled = cnn.avg_pool_global(out)
    else:
        cnt = jnp.asarray(vhw[0] * vhw[1], jnp.float32)
        pooled = (jnp.sum(out, axis=(1, 2), dtype=jnp.float32) /
                  cnt).astype(out.dtype)
    feats['pooled'] = pooled
    if features:
        return feats, new_stats
    if cfg['dual_head']:
        occ = cnn.linear(params['fc_occ'], pooled)
        depth = cnn.linear(params['fc_depth'], pooled)
        return (occ, depth), new_stats
    return cnn.linear(params['fc'], pooled), new_stats


def run_stage(params, stats, cfg, stage_idx, x, train=False):
    """Apply one residual stage (1-indexed) to `x`. Used by the MiDaS
    order branches, which interleave trunk features between stages
    (reference midas/midas_net.py:91-99, 193-206)."""
    name = f'layer{stage_idx}'
    stage_new = []
    out = x
    for bi, (bp, bs) in enumerate(zip(params[name], stats[name])):
        stride = 2 if (stage_idx > 1 and bi == 0) else 1
        out, bns = _block_apply(bp, bs, out, cfg['block'], stride,
                                cfg['groups'], 1, train)
        stage_new.append(bns)
    return out, stage_new


def run_stem(params, stats, x, train=False):
    """conv1+bn+relu+maxpool (the reference's fused 'layer1' prefix)."""
    out = cnn.conv2d(params['conv1'], x, stride=2, padding=3)
    out, bn1 = cnn.batch_norm(params['bn1'], stats['bn1'], out, train)
    out = jax.nn.relu(out)
    return cnn.max_pool(out, 3, 2, 1), bn1


def make(arch='resnet50', **kw):
    """Convenience: returns (init_fn, apply_fn) closed over arch."""
    def init_fn(key, **ikw):
        merged = {**kw, **ikw}
        return init(key, arch=arch, **merged)
    return init_fn, functools.partial(apply)
