"""Frozen golden outputs: guard model numerics against silent drift
across refactors/rounds. Regenerate ONLY with a deliberate decision
(tests/goldens/regenerate via the commands in the file header of
tests/goldens/model_outputs.npz creation — see git history)."""

import os

import numpy as np
import jax

from instaorder_tpu.models import resnet, unet, midas

GOLDEN = os.path.join(os.path.dirname(__file__), 'goldens',
                      'model_outputs.npz')


def test_resnet_golden():
    g = np.load(GOLDEN)
    p, s, cfg = resnet.init(jax.random.PRNGKey(42), arch='resnet50',
                            in_channels=5, num_classes=[2, 3],
                            weight_init='xavier',
                            layers_override=(1, 1, 1, 1))
    x = np.linspace(-1, 1, 2 * 32 * 32 * 5,
                    dtype=np.float32).reshape(2, 32, 32, 5)
    (occ, dep), _ = resnet.apply(p, s, cfg, x, train=False)
    np.testing.assert_allclose(np.asarray(occ), g['resnet_occ'], atol=1e-5)
    np.testing.assert_allclose(np.asarray(dep), g['resnet_dep'], atol=1e-5)


def test_unet_golden():
    g = np.load(GOLDEN)
    p, s, cfg = unet.init(jax.random.PRNGKey(43), in_channels=2, w=1,
                          n_classes=2, depth=2)
    x = np.linspace(0, 1, 1 * 32 * 32 * 2,
                    dtype=np.float32).reshape(1, 32, 32, 2)
    logits, _ = unet.apply(p, s, cfg, x, train=False)
    np.testing.assert_allclose(np.asarray(logits), g['unet'], atol=1e-5)


def test_midas_golden():
    g = np.load(GOLDEN)
    p, s, cfg = midas.init(jax.random.PRNGKey(44), features=16,
                           variant='midas', trunk_layers=(1, 1, 1, 1))
    x = np.linspace(0, 1, 1 * 64 * 64 * 3,
                    dtype=np.float32).reshape(1, 64, 64, 3)
    disp, _ = midas.apply(p, s, cfg, x, train=False)
    np.testing.assert_allclose(np.asarray(disp), g['midas_disp'],
                               atol=1e-5)
