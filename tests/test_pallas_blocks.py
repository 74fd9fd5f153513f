"""Pallas fused bottleneck: interpret-mode parity vs the XLA reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instaorder_tpu.ops.pallas_blocks import (fused_bottleneck,
                                              bottleneck_reference)


def make_block(seed, N=2, H=16, W=16, cin=256, cm=64):
    rng = np.random.RandomState(seed)
    x = rng.randn(N, H, W, cin).astype(np.float32)
    args = (rng.randn(cin, cm).astype(np.float32) * 0.05,
            rng.randn(cm).astype(np.float32) * 0.1,
            rng.randn(3, 3, cm, cm).astype(np.float32) * 0.05,
            rng.randn(cm).astype(np.float32) * 0.1,
            rng.randn(cm, cin).astype(np.float32) * 0.05,
            rng.randn(cin).astype(np.float32) * 0.1)
    return x, args


@pytest.mark.parametrize("batch_tile", [1, 2])
def test_fused_bottleneck_parity(batch_tile):
    x, args = make_block(0)
    want = np.asarray(bottleneck_reference(jnp.asarray(x),
                                           *map(jnp.asarray, args)))
    got = np.asarray(fused_bottleneck(jnp.asarray(x), *map(jnp.asarray,
                                                           args),
                                      interpret=True,
                                      batch_tile=batch_tile))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_fused_bottleneck_border_behavior():
    """Zero padding at image borders must match the conv's zero padding
    (per image, no leakage between tile members)."""
    x, args = make_block(1, N=2, H=8, W=8, cin=128, cm=32)
    x[0] = 1.0
    x[1] = -1.0
    want = np.asarray(bottleneck_reference(jnp.asarray(x),
                                           *map(jnp.asarray, args)))
    got = np.asarray(fused_bottleneck(jnp.asarray(x), *map(jnp.asarray,
                                                           args),
                                      interpret=True, batch_tile=2))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_folded_trunk_with_pallas_interpret_equivalence():
    """apply_folded(use_pallas) == apply_folded(xla) in interpret mode."""
    from instaorder_tpu.models import resnet
    from instaorder_tpu.models.folding import fold_resnet, apply_folded
    from instaorder_tpu.ops import pallas_blocks

    params, stats, cfg = resnet.init(
        jax.random.PRNGKey(0), arch='resnet50', in_channels=5,
        num_classes=2, layers_override=(2, 1, 1, 1))
    folded = fold_resnet(params, stats, cfg)
    x = np.random.RandomState(0).randn(2, 64, 64, 5).astype(np.float32)
    want = np.asarray(apply_folded(folded, cfg, x))

    orig = pallas_blocks.fused_bottleneck

    def interp(x_, *a, **kw):
        kw['interpret'] = True
        return orig(x_, *a, **kw)

    pallas_blocks.fused_bottleneck = interp
    try:
        got = np.asarray(apply_folded(folded, cfg, x, use_pallas=True))
    finally:
        pallas_blocks.fused_bottleneck = orig
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_fused_stage_parity():
    rng = np.random.RandomState(3)
    N, H, W, cin, cm, K = 2, 16, 16, 256, 64, 3
    x = rng.randn(N, H, W, cin).astype(np.float32)
    w1 = rng.randn(K, cin, cm).astype(np.float32) * 0.05
    b1 = rng.randn(K, cm).astype(np.float32) * 0.1
    w2 = rng.randn(K, 3, 3, cm, cm).astype(np.float32) * 0.05
    b2 = rng.randn(K, cm).astype(np.float32) * 0.1
    w3 = rng.randn(K, cm, cin).astype(np.float32) * 0.05
    b3 = rng.randn(K, cin).astype(np.float32) * 0.1
    want = jnp.asarray(x)
    for k in range(K):
        want = bottleneck_reference(want, w1[k], b1[k], w2[k], b2[k],
                                    w3[k], b3[k])
    from instaorder_tpu.ops.pallas_blocks import fused_bottleneck_stage
    got = fused_bottleneck_stage(jnp.asarray(x), *map(jnp.asarray,
                                                      (w1, b1, w2, b2, w3,
                                                       b3)),
                                 interpret=True, batch_tile=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5)


def test_fused_stem_parity():
    from instaorder_tpu.ops.pallas_blocks import fused_stem, stem_reference
    rng = np.random.RandomState(4)
    x = rng.randn(2, 32, 32, 5).astype(np.float32)
    w = rng.randn(7, 7, 5, 64).astype(np.float32) * 0.05
    b = rng.randn(64).astype(np.float32) * 0.1
    want = np.asarray(stem_reference(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b)))
    got = np.asarray(fused_stem(jnp.asarray(x), jnp.asarray(w),
                                jnp.asarray(b), interpret=True,
                                batch_tile=2))
    np.testing.assert_allclose(got, want, atol=1e-5)
