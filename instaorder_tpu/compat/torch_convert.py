"""PyTorch checkpoint -> JAX pytree weight conversion.

The reference ships 14 released `.pth.tar` checkpoints plus the MiDaS
`model-f6b98070.pt` (reference README.md:53-67, midas/base_model.py:4-15).
This module maps their state_dict names onto our functional pytrees:

  torch OIHW conv weight      -> HWIO  (transpose 2,3,1,0)
  torch (out, in) linear      -> (in, out) transpose
  bn {weight,bias,running_*}  -> params {scale,bias} / stats {mean,var}

Checkpoint dicts are `{step, state_dict, optimizer}` with a `module.`
prefix from the reference's DistModule wrapper (single_stage_model.py:66-72).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp


def _np(t):
    # torch tensor or ndarray -> numpy without importing torch here
    if hasattr(t, 'detach'):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t):
    return jnp.asarray(_np(t).transpose(2, 3, 1, 0))  # OIHW -> HWIO


def linear_w(t):
    return jnp.asarray(_np(t).T)


def strip_prefix(sd: Dict, prefix: str = 'module.') -> Dict:
    return {(k[len(prefix):] if k.startswith(prefix) else k): v
            for k, v in sd.items()}


def resnet_from_torch_state_dict(sd: Dict, cfg,
                                 lenient: bool = False) -> Tuple[Dict,
                                                                 Dict]:
    """torch resnet_cls-style state_dict -> (params, stats) for
    models/resnet.apply. `cfg` is the static cfg from resnet.init.
    Accepts either 3- or 5-channel conv1 (shape taken from the ckpt).
    Handles single fc, dual fc_occ/fc_depth heads, and headless dicts.

    lenient: skip (rather than raise on) components whose source keys
    are missing — partial state_dicts (pruned/backbone-only, or BN
    without running stats) then convert to a partial tree that
    _lenient_merge fills with the scratch init, matching the reference's
    load_state_dict(strict=False) subset-load semantics
    (resnet_cls.py:227-232)."""
    sd = strip_prefix(sd)
    p: Dict = {}
    s: Dict = {}

    def put(fn):
        try:
            fn()
        except KeyError:
            if not lenient:
                raise

    put(lambda: p.__setitem__('conv1', {'w': conv_w(sd['conv1.weight'])}))

    def put_bn(pd, sdict, pk, name):
        # field-wise so a state_dict stripped of running stats (or of the
        # affine params) still loads the keys it does have — torch
        # load_state_dict(strict=False) loads tensor-by-tensor
        def field(dst, key, src):
            def go():
                v = jnp.asarray(_np(sd[src]))  # may KeyError before the
                dst.setdefault(pk, {})[key] = v  # subdict is created
            put(go)
        field(pd, 'scale', f'{name}.weight')
        field(pd, 'bias', f'{name}.bias')
        field(sdict, 'mean', f'{name}.running_mean')
        field(sdict, 'var', f'{name}.running_var')

    put_bn(p, s, 'bn1', 'bn1')
    block = cfg['block']
    for li, blocks in enumerate(cfg['layers']):
        stage_p, stage_s = [], []
        for bi in range(blocks):
            pre = f'layer{li + 1}.{bi}'
            bp: Dict = {}
            bs: Dict = {}
            n_convs = 3 if block == 'bottleneck' else 2
            for ci in range(1, n_convs + 1):
                put(lambda ci=ci: bp.__setitem__(
                    f'conv{ci}',
                    {'w': conv_w(sd[f'{pre}.conv{ci}.weight'])}))
                put_bn(bp, bs, f'bn{ci}', f'{pre}.bn{ci}')
            if f'{pre}.downsample.0.weight' in sd:
                put(lambda: bp.__setitem__(
                    'down_conv',
                    {'w': conv_w(sd[f'{pre}.downsample.0.weight'])}))
                put_bn(bp, bs, 'down_bn', f'{pre}.downsample.1')
            stage_p.append(bp)
            stage_s.append(bs)
        p[f'layer{li + 1}'] = stage_p
        s[f'layer{li + 1}'] = stage_s
    for fc in ('fc', 'fc_occ', 'fc_depth'):
        if f'{fc}.weight' in sd:
            put(lambda fc=fc: p.__setitem__(
                fc, {'w': linear_w(sd[f'{fc}.weight']),
                     'b': jnp.asarray(_np(sd[f'{fc}.bias']))}))
    return p, s


def load_pretrain(path, params, stats, cfg, family='resnet', warn=print):
    """Pretrained ingest for TRAINING — reference `load_pretrain`
    semantics (main.py:38-39 + models/backbone/resnet_cls.py:227-232
    strict=False, models/single_stage_model.py:63-64): map a torch
    state_dict onto scratch-initialized (params, stats), keeping the
    scratch values with a warning wherever the checkpoint is missing a
    key or the shapes mismatch (e.g. an ImageNet 3-channel conv1 against
    a 5-channel model, or a 1000-way fc against the 2/3-way order heads).

    family: 'resnet' for the order nets (torchvision/ImageNet or released
    `.pth.tar` state_dicts), 'midas_base' for the MiDaS
    `model-f6b98070.pt` disp trunk (midas/base_model.py:4-15 — the order
    branches stay fresh), 'unet'/'midas' for full-model dicts.
    Returns (params, stats).
    """
    import torch
    blob = torch.load(path, map_location='cpu', weights_only=False)
    sd = (blob['state_dict'] if isinstance(blob, dict) and
          'state_dict' in blob else blob)
    if family == 'resnet':
        p_t, s_t = resnet_from_torch_state_dict(sd, cfg, lenient=True)
    elif family == 'midas_base':
        from .torch_convert_midas import midas_base_from_torch_state_dict
        p_t, s_t = midas_base_from_torch_state_dict(sd, cfg)
    elif family == 'midas':
        from .torch_convert_midas import midas_from_torch_state_dict
        p_t, s_t = midas_from_torch_state_dict(sd, cfg)
    elif family == 'unet':
        from .torch_convert_unet import unet_from_torch_state_dict
        p_t, s_t = unet_from_torch_state_dict(sd, cfg)
    else:
        raise ValueError(family)
    from ..core.checkpoint import _lenient_merge
    params = _lenient_merge(params, p_t, 'params', warn)
    stats = _lenient_merge(stats, s_t, 'stats', warn)
    return params, stats


def convert_checkpoint(path, cfg, family: str = 'resnet'):
    """Load a reference `.pth.tar` and convert. Returns
    (params, stats, step). Requires torch (CPU) at call time only.
    """
    import torch
    blob = torch.load(path, map_location='cpu')
    step = blob.get('step', 0) if isinstance(blob, dict) else 0
    sd = blob['state_dict'] if isinstance(blob, dict) and 'state_dict' in blob else blob
    if family == 'resnet':
        params, stats = resnet_from_torch_state_dict(sd, cfg)
    elif family == 'unet':
        from .torch_convert_unet import unet_from_torch_state_dict
        params, stats = unet_from_torch_state_dict(sd, cfg)
    elif family == 'midas':
        from .torch_convert_midas import midas_from_torch_state_dict
        params, stats = midas_from_torch_state_dict(sd, cfg)
    else:
        raise ValueError(family)
    return params, stats, step
