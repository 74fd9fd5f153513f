"""Minimal functional NN layer for TPU models.

Design: params and batch-norm statistics are plain pytrees (nested dicts of
jnp arrays); every layer is a pure function `y = f(params, x)`. There is no
module object graph — models are `init(key, cfg) -> (params, stats)` plus
`apply(params, stats, x, train) -> (out, new_stats)` pairs, which compose
directly with jit/grad/pjit and keep checkpointing / weight conversion
trivial (a name-indexed tree on both sides).

Data layout is NHWC (TPU-native); conv kernels are HWIO. The PyTorch
converter (compat/torch_convert.py) transposes from NCHW/OIHW.

Numerical parity targets (torch 1.7-era, see reference models/backbone/*):
  conv: cross-correlation, zero padding
  batch norm: eps 1e-5, momentum 0.1, biased batch var for normalisation,
              unbiased var for the running estimate
  max pool 3x3/2/1: -inf padding
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# initialisers (torch formula parity)
# ---------------------------------------------------------------------------


def _fans(shape):
    """fan_in / fan_out for HWIO conv or (in, out) linear weights."""
    if len(shape) == 2:
        return shape[0], shape[1]
    kh, kw, cin_g, cout = shape
    return cin_g * kh * kw, cout * kh * kw


def kaiming_normal_fan_out(key, shape, dtype=jnp.float32):
    """torch.nn.init.kaiming_normal_(mode='fan_out', nonlinearity='relu')."""
    _, fan_out = _fans(shape)
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


def kaiming_normal_fan_in(key, shape, dtype=jnp.float32):
    fan_in, _ = _fans(shape)
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype)


def xavier_normal(key, shape, gain=1.0, dtype=jnp.float32):
    fan_in, fan_out = _fans(shape)
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype)


def torch_linear_default(key, cin, cout, dtype=jnp.float32):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) w + uniform bias."""
    kw_, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    w = jax.random.uniform(kw_, (cin, cout), dtype, -bound, bound)
    b = jax.random.uniform(kb, (cout,), dtype, -bound, bound)
    return {'w': w, 'b': b}


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------


def conv_init(key, kh, kw, cin, cout, groups=1, bias=False,
              init='kaiming_out', gain=0.02, dtype=jnp.float32):
    shape = (kh, kw, cin // groups, cout)
    if init == 'kaiming_out':
        w = kaiming_normal_fan_out(key, shape, dtype)
    elif init == 'xavier':
        w = xavier_normal(key, shape, gain, dtype)
    else:
        raise ValueError(init)
    p = {'w': w}
    if bias:
        p['b'] = jnp.zeros((cout,), dtype)
    return p


def conv2d(params, x, stride=1, padding=0, groups=1, dilation=1):
    """NHWC conv with torch semantics (cross-correlation, zero pad)."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    out = jax.lax.conv_general_dilated(
        x, params['w'],
        window_strides=stride,
        padding=padding,
        rhs_dilation=dilation,
        feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
    )
    if 'b' in params:
        out = out + params['b']
    return out


def bn_init(c, dtype=jnp.float32):
    params = {'scale': jnp.ones((c,), dtype), 'bias': jnp.zeros((c,), dtype)}
    stats = {'mean': jnp.zeros((c,), dtype), 'var': jnp.ones((c,), dtype)}
    return params, stats


def batch_norm(params, stats, x, train, momentum=0.1, eps=1e-5):
    """BatchNorm over (N, H, W) of NHWC input; returns (y, new_stats).

    Per-replica statistics (no cross-device sync) — matches the reference's
    plain nn.BatchNorm2d under its hand-rolled DP (SURVEY.md §7 hard parts).
    """
    if train:
        axes = tuple(range(x.ndim - 1))
        # statistics always in f32 (stable under the bf16 compute policy;
        # identical math for f32 inputs)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes)
        var = jnp.var(xf, axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        new_stats = {
            'mean': ((1 - momentum) * stats['mean'].astype(jnp.float32)
                     + momentum * mean),
            'var': ((1 - momentum) * stats['var'].astype(jnp.float32)
                    + momentum * unbiased),
        }
    else:
        mean, var = (stats['mean'].astype(jnp.float32),
                     stats['var'].astype(jnp.float32))
        new_stats = stats
    inv = (jax.lax.rsqrt(var + eps) *
           params['scale'].astype(jnp.float32))
    out = ((x.astype(jnp.float32) - mean) * inv
           + params['bias'].astype(jnp.float32))
    return out.astype(x.dtype), new_stats


def max_pool(x, window=3, stride=2, padding=1):
    """torch nn.MaxPool2d parity on NHWC input."""
    neg = (-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating)
           else jnp.iinfo(x.dtype).min)
    # typed numpy scalar: python ints weak-type to int32 (dtype mismatch
    # for int8 inputs) and jax arrays break reduce_window's autodiff
    return jax.lax.reduce_window(
        x, np.dtype(x.dtype).type(neg), jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool_global(x):
    """AdaptiveAvgPool2d((1,1)) + flatten: NHWC -> NC."""
    return jnp.mean(x, axis=(1, 2))


def linear_init(key, cin, cout, init='torch_default', gain=0.02,
                dtype=jnp.float32):
    if init == 'torch_default':
        return torch_linear_default(key, cin, cout, dtype)
    if init == 'xavier':
        return {'w': xavier_normal(key, (cin, cout), gain, dtype),
                'b': jnp.zeros((cout,), dtype)}
    raise ValueError(init)


def linear(params, x):
    return x @ params['w'] + params['b']


# ---------------------------------------------------------------------------
# pytree helpers
# ---------------------------------------------------------------------------


def split_keys(key, n):
    return list(jax.random.split(key, n))


def tree_cast(tree, dtype):
    return jax.tree_util.tree_map(lambda a: a.astype(dtype), tree)


def param_count(tree) -> int:
    return sum(int(np.prod(a.shape))
               for a in jax.tree_util.tree_leaves(tree))
