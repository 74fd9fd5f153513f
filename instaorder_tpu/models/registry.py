"""Backbone registry — mirrors the reference's string dispatch
(`backbone.__dict__[arch]`, models/single_stage_model.py:24, exports in
models/backbone/__init__.py:1-7) so existing YAML configs resolve.

Each entry returns a dict with:
  init(key, **backbone_param) -> (params, stats, cfg)
  apply(params, stats, cfg, x, train, **kw) -> (out, new_stats)
"""

from __future__ import annotations

import functools

from . import resnet

BACKBONES = {}


def register(name):
    def deco(factory):
        BACKBONES[name] = factory
        return factory
    return deco


def get_backbone(name):
    if name not in BACKBONES:
        raise KeyError(
            f"unknown backbone '{name}'; have {sorted(BACKBONES)}")
    return BACKBONES[name]()


def _resnet_entry(arch):
    def factory():
        def init(key, in_channels=3, num_classes=1000, weight_init='xavier',
                 **kw):
            return resnet.init(key, arch=arch, in_channels=in_channels,
                               num_classes=num_classes,
                               weight_init=weight_init, **kw)
        return {'init': init, 'apply': resnet.apply}
    return factory


def _unet_entry(factory_name):
    def factory():
        from . import unet

        kw = unet.UNET_FACTORIES[factory_name]

        def init(key, in_channels=3, n_classes=2, **extra):
            return unet.init(key, in_channels=in_channels,
                             n_classes=n_classes, **kw)
        return {'init': init, 'apply': unet.apply}
    return factory


def _midas_entry(variant):
    def factory():
        from . import midas

        def init(key, **kw):
            kw.pop('in_channels', None)
            kw.pop('num_classes', None)
            return midas.init(key, variant=variant, **kw)
        return {'init': init, 'apply': midas.apply}
    return factory


# reference names (resnet_cls.py factories; `resnet50_cls` is the headline)
for _name, _arch in [
    ('resnet18_cls', 'resnet18'),
    ('resnet34_cls', 'resnet34'),
    ('resnet50_cls', 'resnet50'),
    ('resnet101', 'resnet101'),
    ('resnet152', 'resnet152'),
    ('resnext50_32x4d', 'resnext50_32x4d'),
    ('resnext101_32x8d', 'resnext101_32x8d'),
    ('wide_resnet50_2', 'wide_resnet50_2'),
    ('wide_resnet101_2', 'wide_resnet101_2'),
]:
    register(_name)(_resnet_entry(_arch))

# UNet family (PCNet-M backbones, unet_model.py:78-109 + *res variants)
from .unet import UNET_FACTORIES as _UF  # noqa: E402

for _name in _UF:
    register(_name)(_unet_entry(_name))

# MiDaS family (midas/midas_net.py)
register('MidasNet')(_midas_entry('midas'))
register('InstaDepthNet_d')(_midas_entry('instadepthnet_d'))
register('InstaDepthNet_od')(_midas_entry('instadepthnet_od'))
