"""Legacy deocclusion components carried by the reference but unused by
its shipped configs (SURVEY.md §2.4 "deocclusion leftovers") — provided
for capability completeness:

  AE / VAE (+AE256/AE32/VAE32)       <- models/backbone/vae.py
  PartialConv / PCBActiv / PConvUNet <- models/backbone/pconv_unet.py
  InpaintDiscriminator / NLayerDiscriminator (spectral-norm PatchGAN)
                                     <- models/backbone/discriminator.py

Functional NHWC form, matching architectures and activation choices.
Spectral norm is implemented as torch does at eval: weight / sigma_max,
with the power-iteration vector `u` carried in stats and refreshed once
per apply in train mode.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..core import nn as cnn
from ..ops.resize import upsample_bilinear_align_corners
from .unet import _double_conv_init, _double_conv_apply, _max_pool2


def _up2_align(x):
    return jnp.moveaxis(upsample_bilinear_align_corners(
        jnp.moveaxis(x, -1, 1), x.shape[1] * 2, x.shape[2] * 2), 1, -1)


# ---------------------------------------------------------------------------
# AE / VAE
# ---------------------------------------------------------------------------

def ae_init(key, in_channels=3, w=4, latent_dim=256, n_classes=2,
            variational=False):
    keys = iter(cnn.split_keys(key, 12))
    c = lambda m: int(m * w)
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p['inc'], s['inc'] = _double_conv_init(next(keys), in_channels, c(16),
                                           0.02)
    p['down1'], s['down1'] = _double_conv_init(next(keys), c(16), c(32),
                                               0.02)
    p['down2'], s['down2'] = _double_conv_init(next(keys), c(32), c(64),
                                               0.02)
    p['down3'], s['down3'] = _double_conv_init(next(keys), c(64), c(64),
                                               0.02)
    flat = 16384 * w
    flat = int(flat)
    if variational:
        p['mean_linear'] = cnn.linear_init(next(keys), flat, latent_dim)
        p['var_linear'] = cnn.linear_init(next(keys), flat, latent_dim)
    else:
        p['enc_linear'] = cnn.linear_init(next(keys), flat, latent_dim)
    p['dec_linear'] = cnn.linear_init(next(keys), latent_dim, flat)
    p['up1'], s['up1'] = _double_conv_init(next(keys), c(64), c(32), 0.02)
    p['up2'], s['up2'] = _double_conv_init(next(keys), c(32), c(16), 0.02)
    p['up3'], s['up3'] = _double_conv_init(next(keys), c(16), n_classes,
                                           0.02)
    cfg = {'w': w, 'latent_dim': latent_dim, 'variational': variational}
    return p, s, cfg


def ae_apply(params, stats, cfg, x, train=False, rng=None):
    """x: (N, 256-ish, ., C). Returns logits (AE) or (logits, mean,
    logvar) (VAE); second output is new_stats."""
    ns: Dict[str, Any] = {}
    h, ns['inc'] = _double_conv_apply(params['inc'], stats['inc'], x, train)
    for i in (1, 2, 3):
        h, ns[f'down{i}'] = _double_conv_apply(
            params[f'down{i}'], stats[f'down{i}'], _max_pool2(h), train)
    h = _max_pool2(h)
    n = h.shape[0]
    flat = h.reshape(n, -1)
    if cfg['variational']:
        mean = cnn.linear(params['mean_linear'], flat)
        logvar = cnn.linear(params['var_linear'], flat)
        if train and rng is not None:
            eps = jax.random.normal(rng, mean.shape, mean.dtype)
        else:
            eps = jnp.zeros_like(mean)
        z = eps * jnp.exp(0.5 * logvar) + mean
    else:
        z = jax.nn.relu(cnn.linear(params['enc_linear'], flat))
    h = jax.nn.relu(cnn.linear(params['dec_linear'], z))
    side = 16
    h = h.reshape(n, side, side, -1)
    for i in (1, 2, 3):
        h, ns[f'up{i}'] = _double_conv_apply(
            params[f'up{i}'], stats[f'up{i}'], _up2_align(h), train)
    out = _up2_align(h)
    if cfg['variational']:
        return (out, mean, logvar), ns
    return out, ns


# ---------------------------------------------------------------------------
# Partial convolutions (mask-normalised conv)
# ---------------------------------------------------------------------------

def partial_conv(conv_p, x, mask, stride=1, padding=0):
    """PartialConv forward (pconv_unet.py:70-95): renormalise by the
    valid-mask coverage, zero the holes, propagate the mask."""
    out = jax.lax.conv_general_dilated(
        x * mask, conv_p['w'],
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    ones = jnp.ones_like(conv_p['w'])
    mask_sum = jax.lax.conv_general_dilated(
        mask, ones,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    holes = mask_sum == 0
    mask_sum = jnp.where(holes, 1.0, mask_sum)
    bias = conv_p.get('b', jnp.zeros(out.shape[-1], out.dtype))
    out = (out - 0.0) / mask_sum + bias
    out = jnp.where(holes, 0.0, out)
    new_mask = jnp.where(holes, 0.0, 1.0)
    return out, new_mask


_SAMPLES = {'down-7': (7, 2, 3), 'down-5': (5, 2, 2), 'down-3': (3, 2, 1),
            'none-3': (3, 1, 1)}


def pconv_unet_init(key, layer_size=7, input_channels=3):
    keys = iter(cnn.split_keys(key, 2 * layer_size + 4))
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}

    def pcb(k, cin, cout, sample, bn=True, bias=False):
        ksz, _, _ = _SAMPLES[sample]
        blk = {'conv': cnn.conv_init(k, ksz, ksz, cin, cout, bias=bias,
                                     init='kaiming_out'),
               'sample': sample}
        st = {}
        if bn:
            blk['bn'], st['bn'] = cnn.bn_init(cout)
        return blk, st

    p['enc_1'], s['enc_1'] = pcb(next(keys), input_channels, 64, 'down-7',
                                 bn=False)
    p['enc_2'], s['enc_2'] = pcb(next(keys), 64, 128, 'down-5')
    p['enc_3'], s['enc_3'] = pcb(next(keys), 128, 256, 'down-5')
    p['enc_4'], s['enc_4'] = pcb(next(keys), 256, 512, 'down-3')
    for i in range(4, layer_size):
        p[f'enc_{i + 1}'], s[f'enc_{i + 1}'] = pcb(next(keys), 512, 512,
                                                   'down-3')
        p[f'dec_{i + 1}'], s[f'dec_{i + 1}'] = pcb(next(keys), 1024, 512,
                                                   'none-3')
    p['dec_4'], s['dec_4'] = pcb(next(keys), 512 + 256, 256, 'none-3')
    p['dec_3'], s['dec_3'] = pcb(next(keys), 256 + 128, 128, 'none-3')
    p['dec_2'], s['dec_2'] = pcb(next(keys), 128 + 64, 64, 'none-3')
    p['dec_1'], s['dec_1'] = pcb(next(keys), 64 + input_channels, 3,
                                 'none-3', bn=False, bias=True)
    return p, s, {'layer_size': layer_size}


def _pcb_apply(blk, st, x, mask, train, activ='relu'):
    _, stride, pad = _SAMPLES[blk['sample']]
    h, m = partial_conv(blk['conv'], x, mask, stride, pad)
    new_st = dict(st)
    if 'bn' in blk:
        h, new_st['bn'] = cnn.batch_norm(blk['bn'], st['bn'], h, train)
    if activ == 'relu':
        h = jax.nn.relu(h)
    elif activ == 'leaky':
        h = jax.nn.leaky_relu(h, 0.2)
    return h, m, new_st


def _up2_nearest(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def pconv_unet_apply(params, stats, cfg, x, mask, train=False):
    """x, mask: (N, H, W, C) with H, W divisible by 2^layer_size."""
    L = cfg['layer_size']
    ns: Dict[str, Any] = {}
    hs = {0: x}
    ms = {0: mask}
    for i in range(1, L + 1):
        hs[i], ms[i], ns[f'enc_{i}'] = _pcb_apply(
            params[f'enc_{i}'], stats[f'enc_{i}'], hs[i - 1], ms[i - 1],
            train)
    h, m = hs[L], ms[L]
    for i in range(L, 0, -1):
        h = _up2_nearest(h)
        m = _up2_nearest(m)
        h = jnp.concatenate([h, hs[i - 1]], axis=-1)
        m = jnp.concatenate([m, ms[i - 1]], axis=-1)
        activ = None if i == 1 else 'leaky'
        h, m, ns[f'dec_{i}'] = _pcb_apply(params[f'dec_{i}'],
                                          stats[f'dec_{i}'], h, m, train,
                                          activ)
    return (h, m), ns


# ---------------------------------------------------------------------------
# spectral-norm PatchGAN discriminators
# ---------------------------------------------------------------------------

def _sn_conv_init(key, ksz, cin, cout, bias):
    k1, k2 = jax.random.split(key)
    p = cnn.conv_init(k1, ksz, ksz, cin, cout, bias=bias, init='xavier',
                      gain=0.02)
    u = jax.random.normal(k2, (cout,))
    return p, {'u': u / jnp.linalg.norm(u)}


def _sn_conv_apply(p, st, x, stride, padding, train):
    w = p['w']
    cout = w.shape[-1]
    w2d = w.reshape(-1, cout)
    u = st['u']
    v = w2d @ u
    v = v / (jnp.linalg.norm(v) + 1e-12)
    u_new = w2d.T @ v
    u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
    sigma = v @ (w2d @ u_new)
    w_sn = {'w': w / sigma}
    if 'b' in p:
        w_sn['b'] = p['b']
    out = cnn.conv2d(w_sn, x, stride=stride, padding=padding)
    return out, {'u': u_new if train else u}


def inpaint_discriminator_init(key, in_channels, use_spectral_norm=True):
    keys = iter(cnn.split_keys(key, 6))
    chans = [(in_channels, 64, 2), (64, 128, 2), (128, 256, 2),
             (256, 512, 1), (512, 1, 1)]
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for i, (cin, cout, _) in enumerate(chans, 1):
        p[f'conv{i}'], s[f'conv{i}'] = _sn_conv_init(
            next(keys), 4, cin, cout, bias=not use_spectral_norm)
    return p, s, {'strides': [st for _, _, st in chans],
                  'use_sigmoid': True}


def inpaint_discriminator_apply(params, stats, cfg, x, train=False):
    ns = {}
    h = x
    feats = []
    for i, stride in enumerate(cfg['strides'], 1):
        h, ns[f'conv{i}'] = _sn_conv_apply(params[f'conv{i}'],
                                           stats[f'conv{i}'], h, stride, 1,
                                           train)
        if i < len(cfg['strides']):
            h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
    out = jax.nn.sigmoid(h) if cfg['use_sigmoid'] else h
    return (out, feats), ns


def nlayer_discriminator_init(key, input_nc, ndf=64, n_layers=3):
    """70x70 PatchGAN (discriminator.py:84-127) with spectral norm."""
    keys = iter(cnn.split_keys(key, n_layers + 3))
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    seq = [(input_nc, ndf, 2)]
    mult = 1
    for n in range(1, n_layers):
        prev, mult = mult, min(2 ** n, 8)
        seq.append((ndf * prev, ndf * mult, 2))
    prev, mult = mult, min(2 ** n_layers, 8)
    seq.append((ndf * prev, ndf * mult, 1))
    seq.append((ndf * mult, 1, 1))
    for i, (cin, cout, _) in enumerate(seq, 1):
        p[f'conv{i}'], s[f'conv{i}'] = _sn_conv_init(next(keys), 4, cin,
                                                     cout, bias=True)
    return p, s, {'strides': [st for _, _, st in seq]}


def nlayer_discriminator_apply(params, stats, cfg, x, train=False):
    ns = {}
    h = x
    n = len(cfg['strides'])
    for i, stride in enumerate(cfg['strides'], 1):
        h, ns[f'conv{i}'] = _sn_conv_apply(params[f'conv{i}'],
                                           stats[f'conv{i}'], h, stride, 1,
                                           train)
        if i < n:
            h = jax.nn.leaky_relu(h, 0.2)
    return h, ns


# ---------------------------------------------------------------------------
# VGG16 feature extractor (perceptual/style losses)
# ---------------------------------------------------------------------------

# vgg16.features[:17] layer plan: (out_channels, pool_before)
_VGG16_SLICES = (
    # enc_1 = features[:5]  : conv64, conv64, pool is NOT included (pool at
    #   idx 4 IS included: conv,relu,conv,relu,pool? torchvision vgg16
    #   features: 0 conv64,1 relu,2 conv64,3 relu,4 pool -> enc_1 ends with
    #   the pool at stride 2
    ((64, False), (64, False)),          # then pool
    ((128, False), (128, False)),        # features[5:10]: conv,relu,conv,
                                         # relu,pool
    ((256, False), (256, False), (256, False)),  # features[10:17]: 3x conv
                                         # + pool
)


def vgg16_extractor_init(key, in_channels=3):
    """VGG16 enc_1..enc_3 slices (reference pconv_unet.py:33-51). Weights
    are randomly initialised here (no torchvision zoo in this image);
    `vgg16_from_torch_state_dict` converts real weights when provided."""
    keys = iter(cnn.split_keys(key, 16))
    p: Dict[str, Any] = {}
    cin = in_channels
    for si, convs in enumerate(_VGG16_SLICES, 1):
        blocks = []
        for cout, _ in convs:
            blocks.append(cnn.conv_init(next(keys), 3, 3, cin, cout,
                                        bias=True, init='kaiming_out'))
            cin = cout
        p[f'enc_{si}'] = blocks
    return p, {'slices': tuple(len(c) for c in _VGG16_SLICES)}


def vgg16_extractor_apply(params, cfg, image_nhwc):
    """-> [enc_1, enc_2, enc_3] feature maps (each ends with a 2x2 max
    pool, stride 2, like torchvision vgg16.features slices)."""
    results = []
    h = image_nhwc
    for si, n_convs in enumerate(cfg['slices'], 1):
        for conv_p in params[f'enc_{si}']:
            h = jax.nn.relu(cnn.conv2d(conv_p, h, padding=1))
        h = cnn.max_pool(h, window=2, stride=2, padding=0)
        results.append(h)
    return results


def vgg16_from_torch_state_dict(sd, in_channels=3):
    """Convert torchvision vgg16.features[:17] weights (keys like
    'features.0.weight') into the extractor pytree."""
    from ..compat.torch_convert import conv_w, _np
    import jax.numpy as jnp
    idxs = ((0, 2), (5, 7), (10, 12, 14))
    p = {}
    for si, layer_ids in enumerate(idxs, 1):
        blocks = []
        for li in layer_ids:
            blocks.append({'w': conv_w(sd[f'features.{li}.weight']),
                           'b': jnp.asarray(_np(sd[f'features.{li}.bias']))})
        p[f'enc_{si}'] = blocks
    return p
