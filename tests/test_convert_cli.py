"""Released-checkpoint conversion: reference-format .pth.tar -> ours,
forward parity."""

import numpy as np
import torch
import pytest

from torch_ref import TorchResNetCls


def test_convert_released_style_checkpoint(tmp_path):
    # fabricate a released-style checkpoint: {'step', 'state_dict'(module.),
    # 'optimizer'} like single_stage_model.py:66-72
    tm = TorchResNetCls(layers=(1, 1, 1, 1), in_channels=5, num_classes=2)
    tm.eval()
    sd = {f'module.{k}': v for k, v in tm.state_dict().items()}
    blob = {'step': 12345, 'state_dict': sd, 'optimizer': {}}
    pth = tmp_path / 'InstaOrder_InstaOrderNet_o.pth.tar'
    torch.save(blob, str(pth))

    import jax
    from instaorder_tpu.models import resnet
    from instaorder_tpu.compat.torch_convert import convert_checkpoint
    from instaorder_tpu.core import checkpoint as ckpt

    _, _, cfg = resnet.init(jax.random.PRNGKey(0), arch='resnet50',
                            in_channels=5, num_classes=2,
                            layers_override=(1, 1, 1, 1))
    params, stats, step = convert_checkpoint(str(pth), cfg, 'resnet')
    assert step == 12345

    x = np.random.RandomState(0).randn(2, 5, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    got, _ = resnet.apply(params, stats, cfg,
                          x.transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    # save in our format and reload leniently
    p = ckpt.save_state(str(tmp_path), step, params, stats)
    step2, params2, stats2, _ = ckpt.load_state(p, params, stats)
    assert step2 == 12345
    got2, _ = resnet.apply(params2, stats2, cfg,
                           x.transpose(0, 2, 3, 1), train=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(got), atol=0)


def test_profiling_helpers():
    from instaorder_tpu.utils.profiling import (StepTimer, resnet50_flops,
                                                pairs_per_sec_mfu)
    t = StepTimer()
    t.start()
    import jax.numpy as jnp
    t.stop(jnp.ones(4))
    assert t.avg > 0
    assert resnet50_flops(256, 256) > 4.1e9
    mfu = pairs_per_sec_mfu(3639)
    assert 0.0 < mfu < 1.0
