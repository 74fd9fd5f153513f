"""BN folding: folded inference forward == eval-mode forward."""

import numpy as np
import jax

from instaorder_tpu.models import resnet
from instaorder_tpu.models.folding import fold_resnet, apply_folded


def test_folded_matches_eval_forward():
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    # give BN stats non-trivial values
    rng = np.random.RandomState(0)
    stats = jax.tree_util.tree_map(
        lambda a: a + 0.3 * rng.rand(*a.shape).astype(np.float32), stats)
    x = rng.randn(2, 64, 64, 5).astype(np.float32)
    want, _ = resnet.apply(params, stats, cfg, x, train=False)
    folded = fold_resnet(params, stats, cfg)
    got = apply_folded(folded, cfg, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_folded_dual_head():
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(1), arch='resnet50', in_channels=5,
        num_classes=[2, 3], layers_override=(1, 1, 1, 1))
    x = np.random.RandomState(1).randn(2, 64, 64, 5).astype(np.float32)
    want, _ = resnet.apply(params, stats, cfg, x, train=False)
    got = apply_folded(fold_resnet(params, stats, cfg), cfg, x)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-4)


def test_folded_siamese_double_width_stem():
    """apply_folded_siamese (one double-width stem conv, channel halves
    -> batch halves) == two apply_folded passes with swapped mask
    channels (reference inference.py:196-214 runs both orders)."""
    from instaorder_tpu.models.folding import apply_folded_siamese
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(3), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    rng = np.random.RandomState(3)
    x = rng.randn(2, 64, 64, 5).astype(np.float32)
    folded = fold_resnet(params, stats, cfg)
    o1, o2 = apply_folded_siamese(folded, cfg, x)
    perm = [1, 0, 2, 3, 4]
    np.testing.assert_allclose(
        np.asarray(o1), np.asarray(apply_folded(folded, cfg, x)),
        atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(o2),
        np.asarray(apply_folded(folded, cfg, x[..., perm])), atol=2e-4)


def test_folded_bf16_close():
    import jax.numpy as jnp
    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(2), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(1, 1, 1, 1))
    x = np.random.RandomState(2).randn(2, 64, 64, 5).astype(np.float32)
    f32 = apply_folded(fold_resnet(params, stats, cfg), cfg, x)
    from instaorder_tpu.core.nn import tree_cast
    folded16 = tree_cast(fold_resnet(params, stats, cfg), jnp.bfloat16)
    b16 = apply_folded(folded16, cfg, x, dtype=jnp.bfloat16)
    assert np.asarray(b16).dtype == np.float32  # logits back in f32
    np.testing.assert_allclose(np.asarray(b16), np.asarray(f32), atol=0.15)
