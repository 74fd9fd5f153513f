"""InstaDepthNet_od checkpoint conversion: torch oracle -> our pytree,
full forward parity (disp + both order heads)."""

import numpy as np
import torch
import jax

from instaorder_tpu.models import midas
from instaorder_tpu.compat.torch_convert_midas import \
    midas_from_torch_state_dict

from torch_ref import TorchMidasOracle


def test_instadepthnet_od_conversion_parity():
    tm = TorchMidasOracle(trunk_layers=(1, 1, 1, 1),
                          branch_layers=(1, 1, 1, 1), features=32,
                          variant='od')
    tm.eval()
    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 64, 64).astype(np.float32)
    m1 = (rng.rand(1, 1, 64, 64) > 0.6).astype(np.float32)
    m2 = (rng.rand(1, 1, 64, 64) > 0.6).astype(np.float32)
    with torch.no_grad():
        disp_t, dep_t, occ_t = tm(torch.from_numpy(x),
                                  torch.from_numpy(m1),
                                  torch.from_numpy(m2))

    _, _, cfg = midas.init(jax.random.PRNGKey(0), features=32,
                           variant='instadepthnet_od',
                           trunk_layers=(1, 1, 1, 1),
                           branch_layers=(1, 1, 1, 1))
    params, stats = midas_from_torch_state_dict(tm.state_dict(), cfg)
    (disp, dep, occ), _ = midas.apply(
        params, stats, cfg, x.transpose(0, 2, 3, 1),
        m1[:, 0], m2[:, 0], train=False)
    np.testing.assert_allclose(np.asarray(disp), disp_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dep), dep_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(occ), occ_t.numpy(), atol=2e-4)
