"""Primitive-level numerical parity vs torch (CPU)."""

import numpy as np
import torch
import torch.nn as tnn

from instaorder_tpu.core import nn as cnn


def to_nhwc(x):
    return np.ascontiguousarray(x.transpose(0, 2, 3, 1))


def test_conv2d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 17, 19).astype(np.float32)
    tconv = tnn.Conv2d(5, 8, 3, stride=2, padding=1, bias=True)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()
    p = {'w': tconv.weight.detach().numpy().transpose(2, 3, 1, 0),
         'b': tconv.bias.detach().numpy()}
    got = np.asarray(cnn.conv2d(p, to_nhwc(x), stride=2, padding=1))
    np.testing.assert_allclose(got, to_nhwc(want), atol=1e-5)


def test_grouped_conv_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 32, 9, 9).astype(np.float32)
    tconv = tnn.Conv2d(32, 32, 3, padding=1, groups=8, bias=False)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()
    p = {'w': tconv.weight.detach().numpy().transpose(2, 3, 1, 0)}
    got = np.asarray(cnn.conv2d(p, to_nhwc(x), padding=1, groups=8))
    np.testing.assert_allclose(got, to_nhwc(want), atol=1e-5)


def test_batch_norm_eval_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(4, 6, 8, 8).astype(np.float32)
    tbn = tnn.BatchNorm2d(6)
    tbn.running_mean.data = torch.from_numpy(rng.randn(6).astype(np.float32))
    tbn.running_var.data = torch.from_numpy(
        rng.rand(6).astype(np.float32) + 0.5)
    tbn.weight.data = torch.from_numpy(rng.randn(6).astype(np.float32))
    tbn.bias.data = torch.from_numpy(rng.randn(6).astype(np.float32))
    tbn.eval()
    with torch.no_grad():
        want = tbn(torch.from_numpy(x)).numpy()
    p = {'scale': tbn.weight.detach().numpy(),
         'bias': tbn.bias.detach().numpy()}
    s = {'mean': tbn.running_mean.numpy(), 'var': tbn.running_var.numpy()}
    got, new_s = cnn.batch_norm(p, s, to_nhwc(x), train=False)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-5)


def test_batch_norm_train_stats_match_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 3, 5, 5).astype(np.float32)
    tbn = tnn.BatchNorm2d(3)
    tbn.train()
    want = tbn(torch.from_numpy(x)).detach().numpy()
    p = {'scale': np.ones(3, np.float32), 'bias': np.zeros(3, np.float32)}
    s = {'mean': np.zeros(3, np.float32), 'var': np.ones(3, np.float32)}
    got, new_s = cnn.batch_norm(p, s, to_nhwc(x), train=True)
    np.testing.assert_allclose(np.asarray(got), to_nhwc(want), atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_s['mean']),
                               tbn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_s['var']),
                               tbn.running_var.numpy(), atol=1e-6)


def test_max_pool_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 3, 11, 13).astype(np.float32)
    want = tnn.MaxPool2d(3, 2, 1)(torch.from_numpy(x)).numpy()
    got = np.asarray(cnn.max_pool(to_nhwc(x), 3, 2, 1))
    np.testing.assert_allclose(got, to_nhwc(want), atol=1e-6)


def test_linear_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(4, 10).astype(np.float32)
    tl = tnn.Linear(10, 7)
    with torch.no_grad():
        want = tl(torch.from_numpy(x)).numpy()
    p = {'w': tl.weight.detach().numpy().T, 'b': tl.bias.detach().numpy()}
    got = np.asarray(cnn.linear(p, x))
    np.testing.assert_allclose(got, want, atol=1e-5)
