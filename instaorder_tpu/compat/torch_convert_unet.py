"""UNet (PCNet-M) torch checkpoint conversion.

Source name layout (reference models/backbone/unet/):
  inc.conv.conv.{0,1,3,4}           double_conv (conv,bn,conv,bn)
  down<i>.mpconv.1.conv.{0,1,3,4}   maxpool + double_conv
  up<i>.conv.conv.{0,1,3,4}
  outc.conv.{weight,bias}
  image_encoder.* / reduce_dim.{0,1}  (UNetResNet only)
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from .torch_convert import (_np, conv_w, strip_prefix,
                            resnet_from_torch_state_dict)


def _bn(sd, name):
    params = {'scale': jnp.asarray(_np(sd[f'{name}.weight'])),
              'bias': jnp.asarray(_np(sd[f'{name}.bias']))}
    stats = {'mean': jnp.asarray(_np(sd[f'{name}.running_mean'])),
             'var': jnp.asarray(_np(sd[f'{name}.running_var']))}
    return params, stats


def _double_conv(sd, pre):
    p = {'conv1': {'w': conv_w(sd[f'{pre}.0.weight']),
                   'b': jnp.asarray(_np(sd[f'{pre}.0.bias']))},
         'conv2': {'w': conv_w(sd[f'{pre}.3.weight']),
                   'b': jnp.asarray(_np(sd[f'{pre}.3.bias']))}}
    s = {}
    p['bn1'], s['bn1'] = _bn(sd, f'{pre}.1')
    p['bn2'], s['bn2'] = _bn(sd, f'{pre}.4')
    return p, s


def unet_from_torch_state_dict(sd: Dict, cfg) -> Tuple[Dict, Dict]:
    """-> (params, stats) for models/unet.apply."""
    sd = strip_prefix(sd)
    p: Dict = {}
    s: Dict = {}
    p['inc'], s['inc'] = _double_conv(sd, 'inc.conv.conv')
    depth = cfg['depth']
    for i in range(1, depth + 1):
        p[f'down{i}'], s[f'down{i}'] = _double_conv(
            sd, f'down{i}.mpconv.1.conv')
    # reference UNetD3 names its ups up2..up4; UNet/D2 use up1..; normalise
    up_keys = sorted(k.split('.')[0] for k in sd
                     if k.startswith('up') and k.endswith('conv.0.weight'))
    for i, src in enumerate(up_keys, 1):
        p[f'up{i}'], s[f'up{i}'] = _double_conv(sd, f'{src}.conv.conv')
    p['outc'] = {'w': conv_w(sd['outc.conv.weight']),
                 'b': jnp.asarray(_np(sd['outc.conv.bias']))}
    if cfg.get('use_rgb_encoder'):
        enc_sd = {k[len('image_encoder.'):]: v for k, v in sd.items()
                  if k.startswith('image_encoder.')}
        p['image_encoder'], s['image_encoder'] = \
            resnet_from_torch_state_dict(enc_sd, cfg['rgb_cfg'])
        p['reduce_conv'] = {'w': conv_w(sd['reduce_dim.0.weight']),
                            'b': jnp.asarray(_np(sd['reduce_dim.0.bias']))}
        p['reduce_bn'], s['reduce_bn'] = _bn(sd, 'reduce_dim.1')
    return p, s
