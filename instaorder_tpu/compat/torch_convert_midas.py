"""MiDaS / InstaDepthNet torch checkpoint conversion.

Source name layout (reference midas/midas_net.py + blocks.py):
  pretrained.layer1.{0,1}           conv1/bn1 of the ResNeXt trunk
  pretrained.layer1.4.<b>.*         trunk layer1 blocks
  pretrained.layer{2,3,4}.<b>.*     trunk stages
  scratch.layer{1..4}_rn.weight     reprojection convs (no bias)
  scratch.refinenet{1..4}.resConfUnit{1,2}.conv{1,2}.{weight,bias}
  scratch.output_conv.{0,2,4}.{weight,bias}
  do_net/oo_net/gdo_net.layer1.{0,1} + .layer1.4.<b> + .layer{2..4}.<b>
  depth_fc / occ_fc / fc            separate order heads

The branch nets also appear under their original attribute names
(do_net.conv1.* etc.) because the reference aliases modules into the
Sequential; we read the canonical layerN names.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from .torch_convert import _np, conv_w, linear_w, strip_prefix


def _bn(sd, name):
    params = {'scale': jnp.asarray(_np(sd[f'{name}.weight'])),
              'bias': jnp.asarray(_np(sd[f'{name}.bias']))}
    stats = {'mean': jnp.asarray(_np(sd[f'{name}.running_mean'])),
             'var': jnp.asarray(_np(sd[f'{name}.running_var']))}
    return params, stats


def _resnet_stages(sd, prefix, layers, stage_names):
    """Convert trunk/branch stages given per-stage key prefixes."""
    p: Dict = {}
    s: Dict = {}
    for li, (blocks, stage_prefix) in enumerate(zip(layers, stage_names)):
        stage_p, stage_s = [], []
        for bi in range(blocks):
            pre = f'{prefix}{stage_prefix}.{bi}'
            bp: Dict = {}
            bs: Dict = {}
            for ci in (1, 2, 3):
                bp[f'conv{ci}'] = {'w': conv_w(sd[f'{pre}.conv{ci}.weight'])}
                bp[f'bn{ci}'], bs[f'bn{ci}'] = _bn(sd, f'{pre}.bn{ci}')
            if f'{pre}.downsample.0.weight' in sd:
                bp['down_conv'] = {
                    'w': conv_w(sd[f'{pre}.downsample.0.weight'])}
                bp['down_bn'], bs['down_bn'] = _bn(sd, f'{pre}.downsample.1')
            stage_p.append(bp)
            stage_s.append(bs)
        p[f'layer{li + 1}'] = stage_p
        s[f'layer{li + 1}'] = stage_s
    return p, s


def _headless_resnet(sd, prefix, layers):
    """A trunk/branch whose stem lives at {prefix}layer1.{0,1} and whose
    layer1 blocks live at {prefix}layer1.4.<b> (the reference's Sequential
    repack, midas_net.py:48-49,74,150-151)."""
    p: Dict = {'conv1': {'w': conv_w(sd[f'{prefix}layer1.0.weight'])}}
    s: Dict = {}
    p['bn1'], s['bn1'] = _bn(sd, f'{prefix}layer1.1')
    sp, ss = _resnet_stages(sd, prefix, layers,
                            ['layer1.4', 'layer2', 'layer3', 'layer4'])
    p.update(sp)
    s.update(ss)
    return p, s


def _rcu(sd, pre):
    return {'conv1': {'w': conv_w(sd[f'{pre}.conv1.weight']),
                      'b': jnp.asarray(_np(sd[f'{pre}.conv1.bias']))},
            'conv2': {'w': conv_w(sd[f'{pre}.conv2.weight']),
                      'b': jnp.asarray(_np(sd[f'{pre}.conv2.bias']))}}


def midas_base_from_torch_state_dict(sd: Dict, cfg) -> Tuple[Dict, Dict]:
    """Disp-path-only conversion (trunk + scratch + refinenets + output
    convs) — the exact subset the released MiDaS `model-f6b98070.pt`
    carries. Used for training-time `pretrained_weight` ingest
    (reference midas/base_model.py:4-15 via midas_net.py:30-45): the
    order branches stay at their fresh init."""
    sd = strip_prefix(sd)
    layers_trunk = tuple(cfg['trunk_cfg']['layers'])
    p, s = {}, {}
    tp, ts = _headless_resnet(sd, 'pretrained.', layers_trunk)
    p['trunk'] = tp
    s['trunk'] = ts
    for i in range(1, 5):
        p[f'scratch{i}'] = {'w': conv_w(sd[f'scratch.layer{i}_rn.weight'])}
    for i in range(1, 5):
        pre = f'scratch.refinenet{i}'
        p[f'refinenet{i}'] = {'rcu1': _rcu(sd, f'{pre}.resConfUnit1'),
                              'rcu2': _rcu(sd, f'{pre}.resConfUnit2')}
    for name, idx in (('out_conv1', 0), ('out_conv2', 2), ('out_conv3', 4)):
        p[name] = {'w': conv_w(sd[f'scratch.output_conv.{idx}.weight']),
                   'b': jnp.asarray(_np(sd[f'scratch.output_conv.{idx}.bias']))}
    return p, s


def midas_from_torch_state_dict(sd: Dict, cfg) -> Tuple[Dict, Dict]:
    """-> (params, stats) for models/midas.apply. Stage block counts come
    from the cfg built by midas.init (supports trimmed test variants)."""
    sd = strip_prefix(sd)
    p, s = midas_base_from_torch_state_dict(sd, cfg)

    variant = cfg['variant']
    branch_cfg_key = 'gdo_cfg' if variant == 'instadepthnet_d' else 'do_cfg'
    layers_branch = (tuple(cfg[branch_cfg_key]['layers'])
                     if branch_cfg_key in cfg else (3, 4, 6, 3))
    if variant == 'instadepthnet_d':
        bp, bs = _headless_resnet(sd, 'gdo_net.', layers_branch)
        p['gdo'] = {'net': bp, 'fc': {'w': linear_w(sd['fc.weight']),
                                      'b': jnp.asarray(_np(sd['fc.bias']))}}
        s['gdo'] = {'net': bs}
    elif variant == 'instadepthnet_od':
        bp, bs = _headless_resnet(sd, 'do_net.', layers_branch)
        p['do'] = {'net': bp,
                   'fc': {'w': linear_w(sd['depth_fc.weight']),
                          'b': jnp.asarray(_np(sd['depth_fc.bias']))}}
        s['do'] = {'net': bs}
        op, os_ = _headless_resnet(sd, 'oo_net.', layers_branch)
        p['oo'] = {'net': op,
                   'fc': {'w': linear_w(sd['occ_fc.weight']),
                          'b': jnp.asarray(_np(sd['occ_fc.bias']))}}
        s['oo'] = {'net': os_}
    return p, s
