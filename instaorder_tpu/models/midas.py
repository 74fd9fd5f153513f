"""MiDaS v2.1 monocular disparity + InstaDepthNet order heads, TPU-native.

Parity targets (reference):
  MidasNet            <- midas/midas_net.py:215-277
  InstaDepthNet_d     <- midas/midas_net.py:15-113
  InstaDepthNet_od    <- midas/midas_net.py:116-212
  blocks (scratch reprojections, ResidualConvUnit, FeatureFusionBlock,
  output conv stack)  <- midas/blocks.py:19-195

Architecture: ResNeXt-101 32x8d (WSL) trunk -> four unbiased 3x3 `scratch`
reprojections to `features` channels -> top-down FeatureFusionBlock chain
(each: residual conv units + x2 bilinear upsample with align_corners=TRUE
— the parity-critical interpolation, SURVEY.md §7) -> disparity head
(conv, x2 upsample align_corners=FALSE, conv, relu, 1x1, relu).

The InstaDepthNet order branches are headless ResNet-50s over
cat(mask1, mask2) whose stages consume the RGB trunk's features by
element-wise ADD at matching strides. Everything NHWC.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core import nn as cnn
from ..ops.resize import (upsample_bilinear_align_corners,
                          resize_weights_linear)
from . import resnet


def _upsample2x_half_pixel(x_nhwc):
    """torch F.interpolate(scale_factor=2, bilinear, align_corners=False)
    == cv2 INTER_LINEAR index map; NHWC."""
    import numpy as np
    h, w = x_nhwc.shape[1], x_nhwc.shape[2]
    Wy = jnp.asarray(resize_weights_linear(h, 2 * h))
    Wx = jnp.asarray(resize_weights_linear(w, 2 * w))
    prec = jax.lax.Precision.HIGHEST
    out = jnp.einsum('Hh,nhwc->nHwc', Wy, x_nhwc, precision=prec)
    return jnp.einsum('Ww,nHwc->nHWc', Wx, out, precision=prec)


def _upsample2x_align(x_nhwc):
    return jnp.moveaxis(upsample_bilinear_align_corners(
        jnp.moveaxis(x_nhwc, -1, 1), x_nhwc.shape[1] * 2,
        x_nhwc.shape[2] * 2), 1, -1)


def _rcu_init(key, features):
    k1, k2 = jax.random.split(key)
    return {'conv1': cnn.conv_init(k1, 3, 3, features, features, bias=True),
            'conv2': cnn.conv_init(k2, 3, 3, features, features, bias=True)}


def _rcu_apply(p, x):
    out = jax.nn.relu(x)
    out = cnn.conv2d(p['conv1'], out, padding=1)
    out = jax.nn.relu(out)
    out = cnn.conv2d(p['conv2'], out, padding=1)
    return out + x


def _fusion_init(key, features):
    k1, k2 = jax.random.split(key)
    return {'rcu1': _rcu_init(k1, features), 'rcu2': _rcu_init(k2, features)}


def _fusion_apply(p, x, skip=None):
    out = x
    if skip is not None:
        out = out + _rcu_apply(p['rcu1'], skip)
    out = _rcu_apply(p['rcu2'], out)
    return _upsample2x_align(out)


def init(key, features=256, depth_num_classes=3, occ_num_classes=2,
         variant='midas', non_negative=True, trunk_layers=None,
         branch_layers=None):
    """variant: 'midas' | 'instadepthnet_d' | 'instadepthnet_od'.
    trunk_layers/branch_layers: per-stage block-count overrides (tests).
    Returns (params, stats, cfg)."""
    keys = iter(cnn.split_keys(key, 16))
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    tp, ts, tcfg = resnet.init(next(keys), arch='resnext101_32x8d',
                               in_channels=3, with_head=False,
                               layers_override=trunk_layers)
    p['trunk'] = tp
    s['trunk'] = ts
    trunk_dims = (256, 512, 1024, 2048)
    for i, cin in enumerate(trunk_dims, 1):
        p[f'scratch{i}'] = cnn.conv_init(next(keys), 3, 3, cin, features,
                                         bias=False)
    for i in range(1, 5):
        p[f'refinenet{i}'] = _fusion_init(next(keys), features)
    p['out_conv1'] = cnn.conv_init(next(keys), 3, 3, features, 128,
                                   bias=True)
    p['out_conv2'] = cnn.conv_init(next(keys), 3, 3, 128, 32, bias=True)
    p['out_conv3'] = cnn.conv_init(next(keys), 1, 1, 32, 1, bias=True)

    cfg = {'variant': variant, 'features': features, 'trunk_cfg': tcfg,
           'non_negative': non_negative}

    def order_branch(k, n_classes):
        bp, bs, bcfg = resnet.init(k, arch='resnet50', in_channels=2,
                                   weight_init='xavier', with_head=False,
                                   layers_override=branch_layers)
        kf = jax.random.fold_in(k, 1)
        # the reference's separate fc head keeps torch's default init
        # (it is outside the xavier init_weights call, midas_net.py:51-52)
        head = cnn.linear_init(kf, 2048, n_classes, init='torch_default')
        return {'net': bp, 'fc': head}, {'net': bs}, bcfg

    if variant == 'instadepthnet_d':
        (p['gdo'], s['gdo'], cfg['gdo_cfg']) = order_branch(
            next(keys), depth_num_classes)
    elif variant == 'instadepthnet_od':
        (p['do'], s['do'], cfg['do_cfg']) = order_branch(
            next(keys), depth_num_classes)
        (p['oo'], s['oo'], cfg['oo_cfg']) = order_branch(
            next(keys), occ_num_classes)
    return p, s, cfg


def _disp_path(params, stats, cfg, img, train):
    """Trunk features + refinenet decode -> (disp (N,H,W), trunk feats)."""
    feats, trunk_stats = resnet.apply(params['trunk'], stats['trunk'],
                                      cfg['trunk_cfg'], img, train=train,
                                      features=True)
    rn = [cnn.conv2d(params[f'scratch{i}'], feats[f'layer{i}'], padding=1)
          for i in range(1, 5)]
    path4 = _fusion_apply(params['refinenet4'], rn[3])
    path3 = _fusion_apply(params['refinenet3'], path4, rn[2])
    path2 = _fusion_apply(params['refinenet2'], path3, rn[1])
    path1 = _fusion_apply(params['refinenet1'], path2, rn[0])
    out = cnn.conv2d(params['out_conv1'], path1, padding=1)
    out = _upsample2x_half_pixel(out)
    out = jax.nn.relu(cnn.conv2d(params['out_conv2'], out, padding=1))
    out = cnn.conv2d(params['out_conv3'], out)
    if cfg['non_negative']:
        out = jax.nn.relu(out)
    return out[..., 0], feats, trunk_stats


def _order_branch_apply(branch_p, branch_s, bcfg, masks2ch, trunk_feats,
                        train):
    """Headless resnet50 over cat(masks) with additive trunk fusion
    (midas_net.py:91-99)."""
    new_s: Dict[str, Any] = {}
    h, new_s['bn1'] = resnet.run_stem(branch_p['net'], branch_s['net'],
                                      masks2ch, train)
    h, new_s['layer1'] = resnet.run_stage(branch_p['net'], branch_s['net'],
                                          bcfg, 1, h, train)
    for li, feat_key in ((2, 'layer1'), (3, 'layer2'), (4, 'layer3')):
        h, new_s[f'layer{li}'] = resnet.run_stage(
            branch_p['net'], branch_s['net'], bcfg, li,
            h + trunk_feats[feat_key], train)
    pooled = cnn.avg_pool_global(h)
    return cnn.linear(branch_p['fc'], pooled), {'net': new_s}


def apply(params, stats, cfg, img, mask1=None, mask2=None, train=False):
    """MidasNet: img (N,H,W,3) -> (disp, new_stats).
    InstaDepthNet_d: -> ((disp, depth_logits, None), new_stats).
    InstaDepthNet_od: -> ((disp, depth_logits, occ_logits), new_stats).
    masks: (N, H, W)."""
    disp, feats, trunk_stats = _disp_path(params, stats, cfg, img, train)
    new_stats: Dict[str, Any] = {'trunk': trunk_stats}
    variant = cfg['variant']
    if variant == 'midas':
        return disp, new_stats
    m2 = jnp.stack([mask1, mask2], axis=-1)
    if variant == 'instadepthnet_d':
        depth, gdo_s = _order_branch_apply(params['gdo'], stats['gdo'],
                                           cfg['gdo_cfg'], m2, feats, train)
        new_stats['gdo'] = gdo_s
        return (disp, depth, None), new_stats
    assert variant == 'instadepthnet_od'
    depth, do_s = _order_branch_apply(params['do'], stats['do'],
                                      cfg['do_cfg'], m2, feats, train)
    occ, oo_s = _order_branch_apply(params['oo'], stats['oo'],
                                    cfg['oo_cfg'], m2, feats, train)
    new_stats['do'] = do_s
    new_stats['oo'] = oo_s
    return (disp, depth, occ), new_stats
