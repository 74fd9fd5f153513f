"""UNet family (PCNet-M backbone), TPU-native NHWC functional form.

Parity with the reference's `models/backbone/unet/`:
  UNet / UNetD2 / UNetD3 and width factories  <- unet_model.py
  double_conv / down / up / outconv blocks    <- unet_parts.py
  UNetResNet (rgb encoder fused at bottleneck) <- unet_resnet_model.py

Details that matter for checkpoint parity:
  * 3x3 convs have bias (torch Conv2d default)
  * up path: bilinear x2 with align_corners=True, pad to skip size,
    concat [skip, x] (skip FIRST, unet_parts.py:76), double_conv
  * outconv is a biased 1x1
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core import nn as cnn
from ..ops.resize import upsample_bilinear_align_corners

# depth layouts: channel multipliers per stage (x16w), mirrors unet_model
_LAYOUTS = {
    # name: (downs, ups) as channel specs; built explicitly in init
    'd4': None, 'd3': None, 'd2': None,
}


def _double_conv_init(key, cin, cout, gain):
    k1, k2 = jax.random.split(key)
    p = {'conv1': cnn.conv_init(k1, 3, 3, cin, cout, bias=True,
                                init='xavier', gain=gain),
         'conv2': cnn.conv_init(k2, 3, 3, cout, cout, bias=True,
                                init='xavier', gain=gain)}
    s = {}
    p['bn1'], s['bn1'] = cnn.bn_init(cout)
    p['bn2'], s['bn2'] = cnn.bn_init(cout)
    return p, s


def _double_conv_apply(p, s, x, train):
    ns = {}
    x = cnn.conv2d(p['conv1'], x, padding=1)
    x, ns['bn1'] = cnn.batch_norm(p['bn1'], s['bn1'], x, train)
    x = jax.nn.relu(x)
    x = cnn.conv2d(p['conv2'], x, padding=1)
    x, ns['bn2'] = cnn.batch_norm(p['bn2'], s['bn2'], x, train)
    return jax.nn.relu(x), ns


def _max_pool2(x):
    return cnn.max_pool(x, window=2, stride=2, padding=0)


def _up_apply(p, s, x, skip, train):
    """bilinear x2 (align corners) + pad-to-skip + concat + double conv."""
    x = jnp.moveaxis(upsample_bilinear_align_corners(
        jnp.moveaxis(x, -1, 1), x.shape[1] * 2, x.shape[2] * 2), 1, -1)
    dy = skip.shape[1] - x.shape[1]
    dx = skip.shape[2] - x.shape[2]
    if dy or dx:
        x = jnp.pad(x, ((0, 0), (dy // 2, dy - dy // 2),
                        (dx // 2, dx - dx // 2), (0, 0)))
    return _double_conv_apply(p, s, jnp.concatenate([skip, x], -1), train)


def _stage_channels(depth: int, w: float):
    """Per-stage channel plan matching unet_model.py widths."""
    c = lambda m: int(m * w)
    if depth == 4:
        enc = [c(16), c(32), c(64), c(128), c(128)]
        ups = [(c(256), c(64)), (c(128), c(32)), (c(64), c(16)),
               (c(32), c(16))]
    elif depth == 3:
        enc = [c(16), c(32), c(64), c(64)]
        ups = [(c(128), c(32)), (c(64), c(16)), (c(32), c(16))]
    elif depth == 2:
        enc = [c(16), c(32), c(32)]
        ups = [(c(64), c(16)), (c(32), c(16))]
    else:
        raise ValueError(depth)
    return enc, ups


def init(key, in_channels=3, w=4, n_classes=2, depth=4, gain=0.02,
         use_rgb_encoder=False):
    """Build (params, stats, cfg) for UNet/UNetD3/UNetD2 (depth 4/3/2) or
    UNetResNet (use_rgb_encoder with depth 4)."""
    enc, ups = _stage_channels(depth, w)
    keys = iter(cnn.split_keys(key, 3 + len(enc) + len(ups) + 2))
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p['inc'], s['inc'] = _double_conv_init(next(keys), in_channels, enc[0],
                                           gain)
    for i in range(1, len(enc)):
        p[f'down{i}'], s[f'down{i}'] = _double_conv_init(
            next(keys), enc[i - 1], enc[i], gain)
    if use_rgb_encoder:
        assert depth == 4
        from . import resnet as resnet_mod
        rp, rs, rcfg = resnet_mod.init(next(keys), arch='resnet18',
                                       in_channels=3, with_head=False)
        p['image_encoder'] = rp
        s['image_encoder'] = rs
        k = next(keys)
        p['reduce_conv'] = cnn.conv_init(k, 1, 1, 512, int(128 * w),
                                         bias=True, init='xavier', gain=gain)
        p['reduce_bn'], s['reduce_bn'] = cnn.bn_init(int(128 * w))
        ups = [(int(384 * w), int(64 * w))] + ups[1:]
        rgb_cfg = rcfg
    else:
        rgb_cfg = None
    for i, (cin, cout) in enumerate(ups, 1):
        p[f'up{i}'], s[f'up{i}'] = _double_conv_init(next(keys), cin, cout,
                                                     gain)
    p['outc'] = cnn.conv_init(next(keys), 1, 1, ups[-1][1], n_classes,
                              bias=True, init='xavier', gain=gain)
    cfg = {'depth': depth, 'w': w, 'n_ups': len(ups),
           'use_rgb_encoder': use_rgb_encoder, 'rgb_cfg': rgb_cfg}
    return p, s, cfg


def apply(params, stats, cfg, x, rgb=None, train=False):
    """Forward. x: (N, H, W, C); rgb (UNetResNet only): (N, H, W, 3).
    Returns (logits (N, H, W, n_classes), new_stats)."""
    depth = cfg['depth']
    ns: Dict[str, Any] = {}
    feats = []
    h, ns['inc'] = _double_conv_apply(params['inc'], stats['inc'], x, train)
    feats.append(h)
    for i in range(1, depth + 1):
        h, ns[f'down{i}'] = _double_conv_apply(
            params[f'down{i}'], stats[f'down{i}'], _max_pool2(h), train)
        feats.append(h)
    if cfg['use_rgb_encoder']:
        from . import resnet as resnet_mod
        rfeats, ns['image_encoder'] = resnet_mod.apply(
            params['image_encoder'], stats['image_encoder'], cfg['rgb_cfg'],
            rgb, train=train, features=True)
        img = cnn.conv2d(params['reduce_conv'], rfeats['layer4'])
        img, ns['reduce_bn'] = cnn.batch_norm(params['reduce_bn'],
                                              stats['reduce_bn'], img, train)
        img = jax.nn.relu(img)
        img = jnp.moveaxis(upsample_bilinear_align_corners(
            jnp.moveaxis(img, -1, 1), h.shape[1], h.shape[2]), 1, -1)
        h = jnp.concatenate([h, img], axis=-1)
    for i in range(1, cfg['n_ups'] + 1):
        skip = feats[depth - i]
        h, ns[f'up{i}'] = _up_apply(params[f'up{i}'], stats[f'up{i}'], h,
                                    skip, train)
    return cnn.conv2d(params['outc'], h), ns


# width factories mirroring unet_model.py:78-109 / unet_resnet_model.py:46-59
UNET_FACTORIES = {
    'unet025': dict(w=0.25, depth=4), 'unet05': dict(w=0.5, depth=4),
    'unet1': dict(w=1, depth=4), 'unet2': dict(w=2, depth=4),
    'unet4': dict(w=4, depth=4),
    'unet1d2': dict(w=1, depth=2), 'unet2d2': dict(w=2, depth=2),
    'unet4d2': dict(w=4, depth=2),
    'unet1d3': dict(w=1, depth=3), 'unet2d3': dict(w=2, depth=3),
    'unet4d3': dict(w=4, depth=3),
    'unet025res': dict(w=0.25, depth=4, use_rgb_encoder=True),
    'unet05res': dict(w=0.5, depth=4, use_rgb_encoder=True),
    'unet1res': dict(w=1, depth=4, use_rgb_encoder=True),
    'unet2res': dict(w=2, depth=4, use_rgb_encoder=True),
    'unet4res': dict(w=4, depth=4, use_rgb_encoder=True),
}
