"""Training-time pretrained ingest (reference main.py:38-39 +
resnet_cls.py:227-232 strict=False + midas/base_model.py:4-15)."""

import os
import types

import numpy as np
import torch
import jax

from torch_ref import TorchResNetCls


def test_imagenet_style_ingest_keeps_mismatched_scratch(tmp_path):
    """A torchvision-style 3-channel/1000-way state_dict onto a 5-channel
    dual-head scratch net: trunk adopted, conv1 + heads kept scratch."""
    from instaorder_tpu.compat.torch_convert import (conv_w, load_pretrain)
    from instaorder_tpu.models import resnet

    tm = TorchResNetCls(layers=(1, 1, 1, 1), in_channels=3,
                        num_classes=1000)
    pth = str(tmp_path / 'imagenet.pth')
    torch.save(tm.state_dict(), pth)

    params, stats, cfg = resnet.init(jax.random.PRNGKey(0), arch='resnet50',
                                     in_channels=5, num_classes=[2, 3],
                                     weight_init='xavier',
                                     layers_override=(1, 1, 1, 1))
    scratch_conv1 = np.asarray(params['conv1']['w'])
    scratch_fc = np.asarray(params['fc_occ']['w'])
    warnings = []
    params2, stats2 = load_pretrain(pth, params, stats, cfg,
                                    family='resnet', warn=warnings.append)
    # trunk adopted from the torch oracle
    np.testing.assert_array_equal(
        np.asarray(params2['layer1'][0]['conv1']['w']),
        np.asarray(conv_w(tm.layer1[0].conv1.weight)))
    np.testing.assert_array_equal(
        np.asarray(stats2['layer3'][0]['bn2']['mean']),
        tm.layer3[0].bn2.running_mean.numpy())
    # shape-mismatched conv1 and missing dual heads keep scratch values
    np.testing.assert_array_equal(np.asarray(params2['conv1']['w']),
                                  scratch_conv1)
    np.testing.assert_array_equal(np.asarray(params2['fc_occ']['w']),
                                  scratch_fc)
    assert any('shape mismatch' in w and 'conv1' in w for w in warnings)
    assert any('missing key' in w and 'fc_occ' in w for w in warnings)


def _trainer_args(fixture_root, img_dir, annot, load_pretrain=None):
    args = types.SimpleNamespace()
    args.model = {
        'algo': 'InstaOrderNet_o', 'total_iter': 1,
        'lr_steps': [2], 'lr_mults': [0.1], 'lr': 1e-3,
        'weight_decay': 1e-4, 'optim': 'SGD',
        'warmup_lr': [], 'warmup_steps': [],
        'backbone_arch': 'resnet50_cls',
        'backbone_param': {'in_channels': 5, 'num_classes': 2,
                           'layers_override': (1, 1, 1, 1)},
        'use_rgb': True,
    }
    if load_pretrain:
        args.model['load_pretrain'] = load_pretrain
    args.data = {
        'dataset': 'InstaOrder',
        'trainval_dataset': 'SupOcclusionOrderDataset',
        'train_image_root': img_dir, 'train_annot_file': annot,
        'val_image_root': img_dir, 'val_annot_file': annot,
        'input_size': 64, 'enlarge_box': 3.0,
        'base_aug': {'flip': False, 'shift': [0, 0], 'scale': [1, 1]},
        'load_rgb': True, 'batch_size': 2, 'batch_size_val': 2,
        'workers': 2, 'patch_or_image': 'patch',
        'data_mean': [0.485, 0.456, 0.406],
        'data_std': [0.229, 0.224, 0.225],
        'base_dir': fixture_root,
    }
    args.trainer = {'initial_val': False, 'val_freq': 1000, 'val_iter': 1,
                    'print_freq': 1, 'save_freq': 1000,
                    'loss_record': ['loss'], 'exp_name': 'pretrain_test'}
    args.seed = 0
    return args


def test_trainer_load_pretrain_first_logits_match_torch(tmp_path):
    """Trainer with model.load_pretrain: the very first forward out of the
    ingested params must equal the torch oracle's (VERDICT r1 task 3)."""
    from instaorder_tpu.data.synthetic import make_instaorder_fixture
    from instaorder_tpu.models import resnet
    from instaorder_tpu.train.trainer import Trainer

    tm = TorchResNetCls(layers=(1, 1, 1, 1), in_channels=5, num_classes=2)
    tm.eval()
    pth = str(tmp_path / 'pretrain.pth.tar')
    torch.save({'step': 0, 'state_dict': {f'module.{k}': v for k, v in
                                          tm.state_dict().items()}}, pth)

    root = str(tmp_path / 'fix')
    os.makedirs(root, exist_ok=True)
    insta, _, img_dir = make_instaorder_fixture(root)
    args = _trainer_args(root, img_dir, insta, load_pretrain=pth)
    t = Trainer(args, n_devices=2, out_dir=str(tmp_path / 'run'))

    x = np.random.RandomState(0).randn(2, 5, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got, _ = resnet.apply(t.params, t.stats, t.net_cfg,
                          x.transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_midas_pretrained_weight_ingest(tmp_path):
    """InstaDepthNet_od + pretrained_weight: disp path adopted from a
    base-MiDaS-style checkpoint, order branches stay fresh; a missing
    file skips with a warning instead of crashing."""
    from torch_ref import TorchMidasOracle

    from instaorder_tpu.compat.torch_convert import load_pretrain
    from instaorder_tpu.models import midas

    tm = TorchMidasOracle(trunk_layers=(1, 1, 1, 1), features=8,
                          variant='midas')
    pth = str(tmp_path / 'model-f6b98070.pt')
    torch.save(tm.state_dict(), pth)

    params, stats, cfg = midas.init(jax.random.PRNGKey(0), features=8,
                                    variant='instadepthnet_od',
                                    trunk_layers=(1, 1, 1, 1),
                                    branch_layers=(1, 1, 1, 1))
    fresh_do = np.asarray(params['do']['fc']['w'])
    warnings = []
    p2, s2 = load_pretrain(pth, params, stats, cfg, family='midas_base',
                           warn=warnings.append)
    np.testing.assert_array_equal(
        np.asarray(p2['out_conv1']['w']),
        tm.state_dict()['scratch.output_conv.0.weight']
        .numpy().transpose(2, 3, 1, 0))
    # order branches untouched by the base checkpoint (midas_net.py:30-45)
    np.testing.assert_array_equal(np.asarray(p2['do']['fc']['w']), fresh_do)
    assert any('.do' in w for w in warnings)  # strict=False warnings fired


def test_load_pretrain_partial_state_dict(tmp_path):
    """A pruned/backbone-only torch state_dict (missing BN running
    stats, heads, and a whole stage) must subset-load with scratch
    values kept — the reference's load_state_dict(strict=False)
    semantics (resnet_cls.py:227-232) — not crash with KeyError."""
    import torch
    from instaorder_tpu.models import resnet
    from instaorder_tpu.compat.torch_convert import load_pretrain

    tm = TorchResNetCls(layers=(1, 1, 1, 1), in_channels=5,
                        num_classes=2)
    sd = tm.state_dict()
    # prune: drop all running stats, the fc head, and layer4 entirely
    sd = {k: v for k, v in sd.items()
          if 'running_' not in k and 'num_batches' not in k
          and not k.startswith('fc') and not k.startswith('layer4')}
    pt = tmp_path / 'partial.pth'
    torch.save(sd, str(pt))

    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    import numpy as np
    fc_before = np.asarray(params['fc']['w'])
    l4_before = np.asarray(params['layer4'][0]['conv1']['w'])
    warns = []
    p2, s2 = load_pretrain(str(pt), params, stats, cfg,
                           warn=warns.append)
    # loaded where present
    np.testing.assert_allclose(
        np.asarray(p2['conv1']['w']),
        np.asarray(sd['conv1.weight'].numpy().transpose(2, 3, 1, 0)))
    # BN affine params load even though the running stats are gone
    # (torch strict=False loads tensor-by-tensor, not per-module)
    np.testing.assert_allclose(np.asarray(p2['bn1']['scale']),
                               sd['bn1.weight'].numpy())
    np.testing.assert_allclose(
        np.asarray(p2['layer1'][0]['bn2']['bias']),
        sd['layer1.0.bn2.bias'].numpy())
    # scratch kept where absent
    np.testing.assert_array_equal(np.asarray(p2['fc']['w']), fc_before)
    np.testing.assert_array_equal(
        np.asarray(p2['layer4'][0]['conv1']['w']), l4_before)
    assert warns, 'missing keys should be warned about'
