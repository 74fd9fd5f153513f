"""Pallas TPU kernels: fused ResNet bottleneck block.

The folded inference forward is HBM-bandwidth bound: XLA materialises
every conv output (conv1x1 -> conv3x3 -> conv1x1 -> add+relu writes ~3x
the block's input size per block). This kernel runs a whole stride-1
bottleneck block per grid step with all intermediates resident in VMEM —
HBM traffic drops to one read of x and one write of out.

Layout: NHWC, one image per grid step. The 3x3 conv is 9 shifted matmuls
over a zero-padded VMEM scratch copy of the mid activations; everything
rides the MXU with f32 accumulation.

Scope: stride 1, groups 1, no downsample branch (the common blocks —
13 of 16 in ResNet-50). Other blocks stay on the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bottleneck_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                       b3_ref, out_ref, h1p_ref):
    """One image per grid step: x (1, H, W, Cin) -> out (1, H, W, Cin).
    h1p_ref: (H+2, W+2, Cm) zero-padded VMEM scratch for the 3x3 stage."""
    _, H, W, Cin = x_ref.shape
    Cm = w1_ref.shape[1]

    x2d = x_ref[0].reshape(H * W, Cin)

    # conv1 1x1 + bias + relu -> (H*W, Cm)
    h1 = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(x2d.dtype)

    # padded scratch (zero borders)
    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[1:H + 1, 1:W + 1, :] = h1.reshape(H, W, Cm)

    # conv2 3x3 as 9 shifted matmuls, f32 accumulation
    acc = jnp.zeros((H * W, Cm), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win = h1p_ref[dy:dy + H, dx:dx + W, :].reshape(H * W, Cm)
            acc = acc + jnp.dot(win, w2_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(x2d.dtype)

    # conv3 1x1 + bias + residual + relu
    out = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    out = out + b3_ref[:] + x2d.astype(jnp.float32)
    out_ref[0] = jnp.maximum(out, 0.0).astype(x2d.dtype).reshape(H, W, Cin)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=False):
    """Stride-1, groups-1, identity-skip bottleneck block.

    x: (N, H, W, Cin); w1: (Cin, Cm); w2: (3, 3, Cm, Cm) HWIO;
    w3: (Cm, Cin); biases per-channel. Returns (N, H, W, Cin).
    """
    N, H, W, Cin = x.shape
    Cm = w1.shape[1]

    return pl.pallas_call(
        _bottleneck_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, Cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, Cm), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32))


def bottleneck_reference(x, w1, b1, w2, b2, w3, b3):
    """XLA reference implementation (for parity tests)."""
    from ..core import nn as cnn
    h = jax.nn.relu(cnn.conv2d({'w': w1[None, None], 'b': b1}, x))
    h = jax.nn.relu(cnn.conv2d({'w': w2, 'b': b2}, h, padding=1))
    h = cnn.conv2d({'w': w3[None, None], 'b': b3}, h)
    return jax.nn.relu(h + x)
