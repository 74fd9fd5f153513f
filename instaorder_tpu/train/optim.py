"""Optimizers with exact torch update-rule parity.

The reference trains with torch.optim.SGD(momentum=0.9, weight_decay) or
Adam(beta1, 0.999) (models/single_stage_model.py:35-44). The LR changes
every iteration via the scheduler, so these optimizers take `lr` as an
argument to `update` rather than baking it into the state — matching the
reference's param_group['lr'] mutation (utils/scheduler.py:28-33).

torch SGD (nesterov=False):
    g <- g + wd * p
    buf <- momentum * buf + g        (buf starts as g: zeros init matches)
    p <- p - lr * buf
torch Adam:
    m <- b1 m + (1-b1) g ; v <- b2 v + (1-b2) g^2
    p <- p - lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _tmap(f, *trees):
    return jax.tree_util.tree_map(f, *trees)


class SGD(NamedTuple):
    momentum: float = 0.9
    weight_decay: float = 0.0

    def init(self, params):
        return {'buf': _tmap(jnp.zeros_like, params)}

    def update(self, grads, state, params, lr):
        wd = self.weight_decay
        mu = self.momentum
        g = _tmap(lambda g_, p: g_ + wd * p, grads, params) if wd else grads
        buf = _tmap(lambda b, g_: mu * b + g_, state['buf'], g)
        new_params = _tmap(lambda p, b: p - lr * b, params, buf)
        return new_params, {'buf': buf}


class Adam(NamedTuple):
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.0

    def init(self, params):
        return {'m': _tmap(jnp.zeros_like, params),
                'v': _tmap(jnp.zeros_like, params),
                't': jnp.zeros((), jnp.int32)}

    def update(self, grads, state, params, lr):
        if self.weight_decay:
            grads = _tmap(lambda g, p: g + self.weight_decay * p, grads,
                          params)
        t = state['t'] + 1
        b1, b2 = self.b1, self.b2
        m = _tmap(lambda m_, g: b1 * m_ + (1 - b1) * g, state['m'], grads)
        v = _tmap(lambda v_, g: b2 * v_ + (1 - b2) * g * g, state['v'], grads)
        c1 = 1 - b1 ** t.astype(jnp.float32)
        c2 = 1 - b2 ** t.astype(jnp.float32)
        new_params = _tmap(
            lambda p, m_, v_: p - lr * (m_ / c1) / (jnp.sqrt(v_ / c2) +
                                                    self.eps),
            params, m, v)
        return new_params, {'m': m, 'v': v, 't': t}


def make_optimizer(name: str, lr_unused=None, weight_decay=0.0, beta1=0.9):
    """Config-string dispatch matching single_stage_model.py:35-44."""
    if name == 'SGD':
        return SGD(momentum=0.9, weight_decay=weight_decay)
    if name == 'Adam':
        return Adam(b1=beta1, b2=0.999)
    raise ValueError(f"No such optimizer: {name}")
