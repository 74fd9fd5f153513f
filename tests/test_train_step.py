"""End-to-end train-step tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from instaorder_tpu.models import resnet
from instaorder_tpu.parallel import make_mesh, shard_batch
from instaorder_tpu.train.algos import make_loss
from instaorder_tpu.train.optim import SGD
from instaorder_tpu.train.step import build_train_step, build_eval_step


def tiny_model(key, num_classes):
    # trimmed-depth resnet for test speed; same code path as resnet50_cls
    return resnet.init(key, arch='resnet50', in_channels=5,
                       num_classes=num_classes, weight_init='xavier',
                       layers_override=(1, 1, 1, 1))


def synthetic_occ_batch(n, sz=64, seed=0):
    rng = np.random.RandomState(seed)
    rgb = rng.rand(n, sz, sz, 3).astype(np.float32)
    m1 = np.zeros((n, sz, sz), np.float32)
    m2 = np.zeros((n, sz, sz), np.float32)
    occ = np.zeros((n, 2), np.float32)
    for i in range(n):
        # two rectangles; the one whose marker pixel brighter "occludes"
        y1, x1 = rng.randint(5, sz // 2, 2)
        m1[i, y1:y1 + 20, x1:x1 + 20] = 1
        y2, x2 = rng.randint(5, sz // 2, 2)
        m2[i, y2:y2 + 20, x2:x2 + 20] = 1
        occ[i] = [rng.rand() > 0.5, rng.rand() > 0.5]
        # plant a learnable signal in the rgb
        rgb[i, 0, 0, 0] = occ[i, 0]
        rgb[i, 0, 1, 0] = occ[i, 1]
    return {'rgb': rgb, 'modal1': m1, 'modal2': m2, 'occ_order': occ}


def test_train_step_runs_and_learns_occ():
    mesh = make_mesh(8)
    params, stats, cfg = tiny_model(jax.random.PRNGKey(0), 2)
    loss_fn = make_loss('InstaOrderNet_o', resnet.apply, cfg,
                        {'use_rgb': True})
    opt = SGD(momentum=0.9, weight_decay=1e-4)
    opt_state = opt.init(params)
    step = build_train_step(loss_fn, opt, mesh)
    batch = synthetic_occ_batch(16)
    # constant target: learnable by the head bias alone in a few steps
    # (swap-symmetric so both passes agree)
    batch['occ_order'] = np.tile(np.array([[1.0, 1.0]], np.float32), (16, 1))
    batch = shard_batch(batch, mesh)
    losses = []
    for i in range(10):
        params, stats, opt_state, logs = step(params, stats, opt_state,
                                              batch, 0.03)
        losses.append(float(logs['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.05, losses


def test_eval_step_deterministic():
    mesh = make_mesh(8)
    params, stats, cfg = tiny_model(jax.random.PRNGKey(1), 2)
    loss_fn = make_loss('InstaOrderNet_o', resnet.apply, cfg,
                        {'use_rgb': True})
    ev = build_eval_step(loss_fn, mesh)
    batch = shard_batch(synthetic_occ_batch(8, seed=3), mesh)
    l1 = float(ev(params, stats, batch)['loss'])
    l2 = float(ev(params, stats, batch)['loss'])
    assert l1 == l2 and np.isfinite(l1)


def test_fused_vs_sequential_siamese_eval_parity():
    """In eval mode (running-stat BN) the fused 2N forward must equal the
    two sequential passes exactly."""
    params, stats, cfg = tiny_model(jax.random.PRNGKey(2), 2)
    batch = synthetic_occ_batch(4, seed=5)
    f_fused = make_loss('InstaOrderNet_o', resnet.apply, cfg,
                        {'use_rgb': True, 'fused_siamese': True})
    f_seq = make_loss('InstaOrderNet_o', resnet.apply, cfg,
                      {'use_rgb': True, 'fused_siamese': False})
    l1, _ = f_fused(params, stats, batch, train=False)
    l2, _ = f_seq(params, stats, batch, train=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)


def test_dual_head_od_step():
    mesh = make_mesh(8)
    params, stats, cfg = tiny_model(jax.random.PRNGKey(3), [2, 3])
    loss_fn = make_loss('InstaOrderNet_od', resnet.apply, cfg,
                        {'use_rgb': True, 'overlap_weight': 0.1,
                         'distinct_weight': 0.9})
    opt = SGD(momentum=0.9, weight_decay=1e-4)
    batch = synthetic_occ_batch(8, seed=7)
    rng = np.random.RandomState(7)
    batch['depth_order'] = rng.randint(0, 3, 8)
    batch['is_overlap'] = rng.randint(0, 2, 8)
    batch['count'] = np.full(8, 2)
    step = build_train_step(loss_fn, opt, mesh)
    p, s, o, logs = step(params, stats, opt.init(params),
                         shard_batch(batch, mesh), 0.01)
    assert np.isfinite(float(logs['loss']))
    assert 'loss_occ' in logs and 'loss_depth' in logs


def test_ordernet_step():
    mesh = make_mesh(8)
    params, stats, cfg = tiny_model(jax.random.PRNGKey(4), 4)
    loss_fn = make_loss('OrderNet_ext', resnet.apply, cfg,
                        {'use_rgb': True})
    opt = SGD()
    batch = synthetic_occ_batch(8, seed=9)
    batch['label'] = np.random.RandomState(9).randint(0, 4, 8)
    step = build_train_step(loss_fn, opt, mesh)
    p, s, o, logs = step(params, stats, opt.init(params),
                         shard_batch(batch, mesh), 0.01)
    assert np.isfinite(float(logs['loss']))


def test_grad_sync_equals_global_mean():
    """pmean-of-grads over the mesh == grads of the global-mean loss
    (the reference's sum(all_reduce)/world equivalence)."""
    mesh = make_mesh(8)
    params, stats, cfg = tiny_model(jax.random.PRNGKey(5), 2)
    loss_fn = make_loss('InstaOrderNet_o', resnet.apply, cfg,
                        {'use_rgb': True})
    batch = synthetic_occ_batch(16, seed=11)

    # single-device global loss grads (batch-mean BCE is per-shard-mean
    # averaged only when shard sizes are equal — they are here)
    def global_loss(p):
        l, _ = loss_fn(p, stats, batch, train=False)
        return l
    g_global = jax.grad(global_loss)(params)

    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(p, b):
        def f(p_):
            l, _ = loss_fn(p_, stats, b, train=False)
            return l
        return jax.lax.pmean(jax.grad(f)(p), 'data')

    g_mesh = jax.jit(shard_map(
        local, mesh=mesh, in_specs=(P(), P('data')), out_specs=P(),
        check_vma=False))(params, batch)
    flat1 = jax.tree_util.tree_leaves(g_global)
    flat2 = jax.tree_util.tree_leaves(g_mesh)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_bf16_mixed_precision_training():
    """compute_dtype='bf16': params stay f32, loss finite and decreases
    with a learnable constant target."""
    mesh = make_mesh(8)
    params, stats, cfg = tiny_model(jax.random.PRNGKey(6), 2)
    loss_fn = make_loss('InstaOrderNet_o', resnet.apply, cfg,
                        {'use_rgb': True, 'compute_dtype': 'bf16'})
    opt = SGD(momentum=0.9, weight_decay=1e-4)
    step = build_train_step(loss_fn, opt, mesh)
    batch = synthetic_occ_batch(16, seed=13)
    batch['occ_order'] = np.tile(np.array([[1.0, 1.0]], np.float32),
                                 (16, 1))
    batch = shard_batch(batch, mesh)
    opt_state = opt.init(params)
    losses = []
    for _ in range(10):
        params, stats, opt_state, logs = step(params, stats, opt_state,
                                              batch, 0.03)
        losses.append(float(logs['loss']))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.05, losses
    # master params remain f32
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.dtype == np.float32


def test_remat_training_matches_no_remat():
    """jax.checkpoint policy: identical loss/grads, lower peak memory."""
    params, stats, cfg = tiny_model(jax.random.PRNGKey(7), 2)
    batch = synthetic_occ_batch(4, seed=17)
    base = make_loss('InstaOrderNet_o', resnet.apply, cfg,
                     {'use_rgb': True})
    rem = make_loss('InstaOrderNet_o', resnet.apply, cfg,
                    {'use_rgb': True, 'remat': True})

    def g(fn):
        def f(p):
            l, _ = fn(p, stats, batch, train=True)
            return l
        return jax.grad(f)(params)

    g1 = g(base)
    g2 = g(rem)
    l1, _ = base(params, stats, batch, train=True)
    l2, _ = rem(params, stats, batch, train=True)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
