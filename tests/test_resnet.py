"""ResNet model parity: converted torch weights -> identical logits."""

import numpy as np
import pytest
import torch

from instaorder_tpu.models import resnet
from instaorder_tpu.compat.torch_convert import resnet_from_torch_state_dict

from torch_ref import TorchResNetCls


def _parity(layers, arch, num_classes, in_ch=5, groups=1, base_width=64,
            train=False, atol=2e-4):
    tm = TorchResNetCls(layers, in_ch, num_classes, groups, base_width)
    tm.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(2, in_ch, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x))
    import jax
    p0, s0, cfg = resnet.init(jax.random.PRNGKey(0), arch=arch,
                              in_channels=in_ch, num_classes=num_classes,
                              layers_override=layers)
    p, s = resnet_from_torch_state_dict(tm.state_dict(), cfg)
    out, _ = resnet.apply(p, s, cfg, x.transpose(0, 2, 3, 1), train=train)
    if isinstance(want, tuple):
        for w, g in zip(want, out):
            np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=atol)
    else:
        np.testing.assert_allclose(np.asarray(out), want.numpy(), atol=atol)


def test_resnet50_cls_single_head_parity():
    _parity((3, 4, 6, 3), 'resnet50', 3)


def test_resnet50_cls_dual_head_parity():
    _parity((3, 4, 6, 3), 'resnet50', [2, 3])


def test_resnext_small_parity():
    # resnext-style grouped convs on a trimmed depth for test speed
    _parity((1, 1, 1, 1), 'resnext50_32x4d', 4, groups=32, base_width=4)


def test_feature_mode_shapes():
    import jax
    p, s, cfg = resnet.init(jax.random.PRNGKey(1), arch='resnet50',
                            in_channels=2, num_classes=3)
    x = np.zeros((1, 96, 96, 2), np.float32)
    feats, _ = resnet.apply(p, s, cfg, x, features=True)
    assert feats['layer1'].shape == (1, 24, 24, 256)
    assert feats['layer2'].shape == (1, 12, 12, 512)
    assert feats['layer3'].shape == (1, 6, 6, 1024)
    assert feats['layer4'].shape == (1, 3, 3, 2048)
    assert feats['pooled'].shape == (1, 2048)


def test_registry_resolves_reference_names():
    from instaorder_tpu.models import get_backbone
    import jax
    bb = get_backbone('resnet50_cls')
    p, s, cfg = bb['init'](jax.random.PRNGKey(0), in_channels=5,
                           num_classes=[2, 3])
    (occ, dep), _ = bb['apply'](p, s, cfg, np.zeros((1, 64, 64, 5),
                                                    np.float32))
    assert occ.shape == (1, 2) and dep.shape == (1, 3)
