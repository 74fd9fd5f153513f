"""Checkpoint conversion CLI: released torch `.pth.tar` zoo -> our format.

Usage:
  python -m instaorder_tpu.compat.convert_cli \
      --torch-ckpt InstaOrder_InstaOrderNet_o.pth.tar \
      --algo InstaOrderNet_o --out ckpt_iter_0.ckpt

Covers the 14 released checkpoints (reference README.md:53-67) plus the
MiDaS `model-f6b98070.pt`. Family and backbone params are inferred from
the algo name.
"""

from __future__ import annotations

import argparse

ALGO_SPECS = {
    # algo -> (family, backbone init kwargs)
    'OrderNet': ('resnet', {'in_channels': 5, 'num_classes': 3}),
    'OrderNet_ext': ('resnet', {'in_channels': 5, 'num_classes': 4}),
    'InstaOrderNet_o': ('resnet', {'in_channels': 5, 'num_classes': 2}),
    'InstaOrderNet_d': ('resnet', {'in_channels': 5, 'num_classes': 3}),
    'InstaOrderNet_od': ('resnet', {'in_channels': 5,
                                    'num_classes': [2, 3]}),
    'pcnet_m': ('unet', {'in_channels': 2, 'n_classes': 2, 'w': 2,
                         'depth': 4}),
    'InstaDepthNet_d': ('midas', {'variant': 'instadepthnet_d'}),
    'InstaDepthNet_od': ('midas', {'variant': 'instadepthnet_od'}),
    'midas_pretrained': ('midas', {'variant': 'midas'}),
}


def convert(torch_ckpt: str, algo: str, out: str):
    import jax
    from ..core import checkpoint as ckpt
    family, kw = ALGO_SPECS[algo]
    if family == 'resnet':
        from ..models import resnet as mod
        _, _, cfg = mod.init(jax.random.PRNGKey(0), arch='resnet50', **kw)
    elif family == 'unet':
        from ..models import unet as mod
        _, _, cfg = mod.init(jax.random.PRNGKey(0), **kw)
    else:
        from ..models import midas as mod
        _, _, cfg = mod.init(jax.random.PRNGKey(0), **kw)
    from .torch_convert import convert_checkpoint
    params, stats, step = convert_checkpoint(torch_ckpt, cfg, family)
    import os
    folder = os.path.dirname(out) or '.'
    path = ckpt.save_state(folder, step, params, stats)
    if os.path.abspath(path) != os.path.abspath(out):
        os.replace(path, out)
    print(f'converted {torch_ckpt} (step {step}) -> {out}')
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--torch-ckpt', required=True)
    ap.add_argument('--algo', required=True, choices=sorted(ALGO_SPECS))
    ap.add_argument('--out', required=True)
    args = ap.parse_args()
    convert(args.torch_ckpt, args.algo, args.out)


if __name__ == '__main__':
    main()
