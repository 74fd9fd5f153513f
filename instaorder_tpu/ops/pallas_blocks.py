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
    """A tile of B images per grid step: x (B, H, W, Cin) -> out same.
    h1p_ref: (B, H+2, W+2, Cm) zero-padded VMEM scratch for the 3x3
    stage (per-image padding keeps images independent)."""
    B, H, W, Cin = x_ref.shape
    Cm = w1_ref.shape[1]

    x2d = x_ref[:].reshape(B * H * W, Cin)

    # conv1 1x1 + bias + relu -> (B*H*W, Cm)
    h1 = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(x2d.dtype)

    # padded scratch (zero borders per image)
    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, 1:H + 1, 1:W + 1, :] = h1.reshape(B, H, W, Cm)

    # conv2 3x3 as ONE im2col matmul: (B*H*W, 9*Cm) @ (9*Cm, Cm).
    # K = 9*Cm keeps the MXU contraction dim full (vs 9 skinny K=Cm
    # matmuls), letting the compute overlap the block DMA.
    cols = jnp.concatenate(
        [h1p_ref[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, Cm)
         for dy in range(3) for dx in range(3)], axis=1)
    w2_flat = w2_ref[:].reshape(9 * Cm, Cm)
    acc = jnp.dot(cols, w2_flat, preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(x2d.dtype)

    # conv3 1x1 + bias + residual + relu
    out = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    out = out + b3_ref[:] + x2d.astype(jnp.float32)
    out_ref[:] = jnp.maximum(out, 0.0).astype(x2d.dtype).reshape(
        B, H, W, Cin)


@functools.partial(jax.jit, static_argnames=('interpret', 'batch_tile'))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=False,
                     batch_tile=None):
    """Stride-1, groups-1, identity-skip bottleneck block.

    x: (N, H, W, Cin); w1: (Cin, Cm); w2: (3, 3, Cm, Cm) HWIO;
    w3: (Cm, Cin); biases per-channel. Returns (N, H, W, Cin).

    batch_tile: images per grid step (amortises per-step fixed cost and
    widens the matmuls). Default: largest divisor of N whose tile fits
    a ~10MB input-block budget.
    """
    N, H, W, Cin = x.shape
    Cm = w1.shape[1]
    if batch_tile is None:
        # ~5MB input-block budget: bt=2 at layer1 (64^2 x 256), larger for
        # the smaller deep stages; bt>2 at layer1 over-pressures VMEM and
        # loses pipelining (measured).
        per_img = H * W * Cin * x.dtype.itemsize
        budget = 5 * 1024 * 1024
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    return pl.pallas_call(
        _bottleneck_kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((B, H + 2, W + 2, Cm), x.dtype)],
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


def _stage_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  out_ref, h1p_ref):
    """K consecutive stride-1 bottleneck blocks on a tile of B images —
    ONE input DMA and ONE output DMA for the whole stage segment.
    Weight refs carry a leading block axis: w1 (K, Cin, Cm), ..."""
    B, H, W, Cin = x_ref.shape
    K, _, Cm = w1_ref.shape

    cur = x_ref[:].reshape(B * H * W, Cin)
    for k in range(K):
        h1 = jnp.dot(cur, w1_ref[k], preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + b1_ref[k], 0.0).astype(cur.dtype)
        h1p_ref[:] = jnp.zeros_like(h1p_ref)
        h1p_ref[:, 1:H + 1, 1:W + 1, :] = h1.reshape(B, H, W, Cm)
        cols = jnp.concatenate(
            [h1p_ref[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, Cm)
             for dy in range(3) for dx in range(3)], axis=1)
        acc = jnp.dot(cols, w2_ref[k].reshape(9 * Cm, Cm),
                      preferred_element_type=jnp.float32)
        h2 = jnp.maximum(acc + b2_ref[k], 0.0).astype(cur.dtype)
        out = jnp.dot(h2, w3_ref[k], preferred_element_type=jnp.float32)
        out = out + b3_ref[k] + cur.astype(jnp.float32)
        cur = jnp.maximum(out, 0.0).astype(cur.dtype)
    out_ref[:] = cur.reshape(B, H, W, Cin)


@functools.partial(jax.jit, static_argnames=('interpret', 'batch_tile'))
def fused_bottleneck_stage(x, w1, b1, w2, b2, w3, b3, interpret=False,
                           batch_tile=None):
    """Run K stacked stride-1 bottleneck blocks (weights with a leading
    block axis) in one pallas call: the intermediate activations between
    blocks never touch HBM.

    x: (N, H, W, Cin); w1: (K, Cin, Cm); w2: (K, 3, 3, Cm, Cm);
    w3: (K, Cm, Cin); b*: (K, C)."""
    N, H, W, Cin = x.shape
    K, _, Cm = w1.shape
    if batch_tile is None:
        per_img = H * W * Cin * x.dtype.itemsize
        budget = 5 * 1024 * 1024
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    return pl.pallas_call(
        _stage_kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((B, H + 2, W + 2, Cm), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32))


def _bottleneck_int8_kernel(x_ref, w1_ref, m1_ref, b1_ref, w2_ref, m2_ref,
                            b2_ref, w3_ref, m3_ref, b3_ref, sxr_ref,
                            out_ref, h1p_ref):
    """int8-I/O bottleneck: x int8 (B,H,W,Cin) -> out int8 same shape.

    HBM traffic halves vs the bf16 kernel; compute stays on the bf16 MXU
    with f32 accumulation, which is EXACT integer arithmetic here (int8
    values are exactly representable in bf16; products <= 127^2 and sums
    of <= 9*512 of them stay under 2^24), so results are bit-identical to
    a native int8 pipeline.

    w* int8; m* f32 per-out-channel (s_in*s_w*r_out folded); b* f32
    (bias*r_out folded); sxr (1,1) f32 = s_x*r_out for the residual.
    Outputs are relu'd and requantized: clip(round(.), 0, 127).
    """
    B, H, W, Cin = x_ref.shape
    Cm = w1_ref.shape[1]

    x2d = x_ref[:].reshape(B * H * W, Cin).astype(jnp.bfloat16)

    acc = jnp.dot(x2d, w1_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    h1 = jnp.clip(jnp.round(jnp.maximum(acc * m1_ref[:] + b1_ref[:], 0.0)),
                  0, 127).astype(jnp.bfloat16)

    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, 1:H + 1, 1:W + 1, :] = h1.reshape(B, H, W, Cm)

    cols = jnp.concatenate(
        [h1p_ref[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, Cm)
         for dy in range(3) for dx in range(3)], axis=1)
    acc2 = jnp.dot(cols, w2_ref[:].reshape(9 * Cm, Cm).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    h2 = jnp.clip(jnp.round(jnp.maximum(acc2 * m2_ref[:] + b2_ref[:], 0.0)),
                  0, 127).astype(jnp.bfloat16)

    acc3 = jnp.dot(h2, w3_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    out = acc3 * m3_ref[:] + b3_ref[:] + x2d.astype(jnp.float32) * sxr_ref[0, 0]
    out_ref[:] = jnp.clip(jnp.round(jnp.maximum(out, 0.0)), 0, 127
                          ).astype(jnp.int8).reshape(B, H, W, Cin)


@functools.partial(jax.jit, static_argnames=('interpret', 'batch_tile'))
def fused_bottleneck_int8(x, w1, m1, b1, w2, m2, b2, w3, m3, b3, sxr,
                          interpret=False, batch_tile=None):
    """Quantized stride-1, groups-1, identity-skip bottleneck.

    x: (N, H, W, Cin) int8; w1: (Cin, Cm) int8; w2: (3, 3, Cm, Cm) int8;
    w3: (Cm, Cin) int8; m*/b*: f32 per-channel folded scale/bias
    (see models/quantize.py); sxr: f32 scalar. Returns int8 (N,H,W,Cin).
    """
    N, H, W, Cin = x.shape
    Cm = w1.shape[1]
    if batch_tile is None:
        per_img = H * W * Cin  # int8: 1 byte
        budget = 4 * 1024 * 1024
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    return pl.pallas_call(
        _bottleneck_int8_kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 + [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
        scratch_shapes=[pltpu.VMEM((B, H + 2, W + 2, Cm), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, m1.astype(jnp.float32), b1.astype(jnp.float32),
      w2, m2.astype(jnp.float32), b2.astype(jnp.float32),
      w3, m3.astype(jnp.float32), b3.astype(jnp.float32),
      jnp.asarray(sxr, jnp.float32).reshape(1, 1))


def _stem_kernel(x_ref, w_ref, b_ref, out_ref, xp_ref, hp_ref):
    """Fused ResNet stem: conv 7x7/2 (pad 3) + bias + relu + maxpool
    3x3/2 (pad 1), all VMEM-resident. One image tile per grid step.

    x_ref: (B, H, W, C); out: (B, H//4, W//4, Cout).
    xp_ref: (B, H+6, W+6, C) zero-padded input scratch.
    hp_ref: (B, H//2+2, W//2+2, Cout) conv output scratch (padded with
    -inf for the maxpool)."""
    B, H, W, C = x_ref.shape
    Cout = w_ref.shape[-1]
    Ho, Wo = H // 2, W // 2

    # NB: scratch is f32 — Mosaic only implements strided (stride-2)
    # VMEM loads for 32-bit data; taps are cast back after the load.
    xp_ref[:] = jnp.zeros_like(xp_ref)
    xp_ref[:, 3:H + 3, 3:W + 3, :] = x_ref[:].astype(xp_ref.dtype)

    # im2col over the 49 taps at stride 2 -> (B*Ho*Wo, 49*C)
    cols = jnp.concatenate(
        [xp_ref[:, dy:dy + H:2, dx:dx + W:2, :]
         .reshape(B * Ho * Wo, C).astype(x_ref.dtype)
         for dy in range(7) for dx in range(7)], axis=1)
    h = jnp.dot(cols, w_ref[:].reshape(49 * C, Cout),
                preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b_ref[:], 0.0).astype(x_ref.dtype)

    neg = jnp.asarray(-jnp.inf, x_ref.dtype)
    hp_ref[:] = jnp.full_like(hp_ref, neg)
    hp_ref[:, 1:Ho + 1, 1:Wo + 1, :] = h.reshape(B, Ho, Wo, Cout)

    # maxpool 3x3 stride 2 pad 1 -> (B, Ho//2, Wo//2, Cout)
    Hq, Wq = Ho // 2, Wo // 2
    pooled = None
    for dy in range(3):
        for dx in range(3):
            win = hp_ref[:, dy:dy + Ho:2, dx:dx + Wo:2, :]
            pooled = win if pooled is None else jnp.maximum(pooled, win)
    out_ref[:] = pooled


@functools.partial(jax.jit, static_argnames=('interpret', 'batch_tile'))
def fused_stem(x, w, b, interpret=False, batch_tile=1):
    """x: (N, H, W, C); w: (7, 7, C, Cout) HWIO; b: (Cout,).
    Returns (N, H//4, W//4, Cout) — the conv1+relu+maxpool stem with the
    intermediate 2x-resolution conv output never touching HBM."""
    N, H, W, C = x.shape
    Cout = w.shape[-1]
    B = batch_tile
    assert N % B == 0 and H % 4 == 0 and W % 4 == 0

    return pl.pallas_call(
        _stem_kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, H, W, C), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, H // 4, W // 4, Cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H // 4, W // 4, Cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((B, H + 6, W + 6, C), jnp.float32),
            pltpu.VMEM((B, H // 2 + 2, W // 2 + 2, Cout), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w, b.astype(jnp.float32))


def stem_reference(x, w, b):
    """XLA reference stem for parity tests."""
    from ..core import nn as cnn
    h = jax.nn.relu(cnn.conv2d({'w': w, 'b': b}, x, stride=2, padding=3))
    return cnn.max_pool(h, 3, 2, 1)


def _bottleneck_down_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                            b3_ref, wd_ref, bd_ref, out_ref, h1p_ref):
    """Stride-1 projection bottleneck (ResNet-50 layer1[0]): identity is
    a 1x1 channel projection (reference resnet_cls.py Bottleneck with
    downsample). x (B, H, W, Cin) -> out (B, H, W, Cout)."""
    B, H, W, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    Cm = w1_ref.shape[1]
    cdt = x_ref.dtype

    x2d = x_ref[:].reshape(B * H * W, Cin)
    h1 = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)

    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, 1:H + 1, 1:W + 1, :] = h1.reshape(B, H, W, Cm)

    cols = jnp.concatenate(
        [h1p_ref[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, Cm)
         for dy in range(3) for dx in range(3)], axis=1)
    acc = jnp.dot(cols, w2_ref[:].reshape(9 * Cm, Cm),
                  preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(cdt)

    out = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    iden = jnp.dot(x2d, wd_ref[:], preferred_element_type=jnp.float32)
    out = out + b3_ref[:] + iden + bd_ref[:]
    out_ref[:] = jnp.maximum(out, 0.0).astype(cdt).reshape(
        B, H, W, Cout)


# stride-2 taps: input row 2y + dy - 1 lives in parity plane a = (dy+1)%2
# at plane row y + (dy-1-a)//2; with a 1-cell front pad the slice start is
# 0 for dy == 0 and 1 otherwise. Same for columns.
_S2_PLANE = {0: (1, 0), 1: (0, 1), 2: (1, 1)}


def _bottleneck_down_s2_kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                               w3_ref, b3_ref, wd_ref, bd_ref, out_ref,
                               h1p_ref):
    """Stride-2 projection bottleneck on space-to-depth parity planes.

    Mosaic has no general strided VMEM loads (stride-2 needs the base
    memref's last dim == 128), so the wrapper de-interleaves x into 4
    even/odd row-col planes xp (2, 2, B, Ho, Wo, Cin) with
    xp[a, b, n, y, x] = x[n, 2y + a, 2x + b]; every 3x3/2 tap and the
    1x1/2 identity projection then become unit-stride plane slices.
    out (B, Ho, Wo, Cout)."""
    _, _, B, Ho, Wo, Cin = xp_ref.shape
    Cout = out_ref.shape[-1]
    Cm = w1_ref.shape[1]
    cdt = xp_ref.dtype

    x2d = xp_ref[:].reshape(4 * B * Ho * Wo, Cin)
    h1 = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)

    # padded parity planes of h1 (front pad 1 row/col for the -1 taps)
    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, :, :, 1:, 1:, :] = h1.reshape(2, 2, B, Ho, Wo, Cm)

    cols = []
    for dy in range(3):
        a, sy = _S2_PLANE[dy]
        for dx in range(3):
            b, sx = _S2_PLANE[dx]
            cols.append(h1p_ref[a, b, :, sy:sy + Ho, sx:sx + Wo, :]
                        .reshape(B * Ho * Wo, Cm))
    acc = jnp.dot(jnp.concatenate(cols, axis=1),
                  w2_ref[:].reshape(9 * Cm, Cm),
                  preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(cdt)

    out = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    # identity 1x1/2 reads x[2y, 2x] = plane (0, 0)
    xs = xp_ref[0, 0].reshape(B * Ho * Wo, Cin)
    iden = jnp.dot(xs, wd_ref[:], preferred_element_type=jnp.float32)
    out = out + b3_ref[:] + iden + bd_ref[:]
    out_ref[:] = jnp.maximum(out, 0.0).astype(cdt).reshape(
        B, Ho, Wo, Cout)


def _space_to_depth(x):
    """(N, H, W, C) -> parity planes (2, 2, N, H//2, W//2, C) with
    planes[a, b, n, y, x] = x[n, 2y + a, 2x + b] (XLA-side copy)."""
    N, H, W, C = x.shape
    return x.reshape(N, H // 2, 2, W // 2, 2, C).transpose(2, 4, 0, 1, 3, 5)


@functools.partial(jax.jit,
                   static_argnames=('stride', 'interpret', 'batch_tile'))
def fused_bottleneck_down(x, w1, b1, w2, b2, w3, b3, wd, bd, stride=1,
                          interpret=False, batch_tile=None):
    """Projection bottleneck block: x (N, H, W, Cin); w1 (Cin, Cm);
    w2 (3, 3, Cm, Cm) HWIO applied at `stride` s in {1, 2};
    w3 (Cm, Cout); wd (Cin, Cout) 1x1/s identity projection.
    Returns (N, H/s, W/s, Cout)."""
    N, H, W, Cin = x.shape
    Cm = w1.shape[1]
    s = stride
    Ho, Wo = H // s, W // s
    Cout = w3.shape[1]
    if batch_tile is None:
        it = x.dtype.itemsize
        # full VMEM footprint per image: in/out blocks are double-buffered
        # by the pipeline; h1 planes + im2col cols + f32 accumulators live
        # once. (The plain 5MB-input heuristic OOMs when Cout >> Cin.)
        per_img = (2 * H * W * Cin * it + 2 * Ho * Wo * Cout * it +
                   (H + 2) * (W + 2) * Cm * it +
                   9 * Ho * Wo * Cm * it +
                   Ho * Wo * max(Cm, Cout) * 4 + H * W * Cm * 4)
        budget = 72 * 1024 * 1024
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    args = (w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
            w3, b3.astype(jnp.float32), wd, bd.astype(jnp.float32))
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8
    out_spec = pl.BlockSpec((B, Ho, Wo, Cout), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, Ho, Wo, Cout), x.dtype)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if s == 1:
        return pl.pallas_call(
            _bottleneck_down_kernel,
            grid=(N // B,),
            in_specs=[pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] + wspecs,
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((B, H + 2, W + 2, Cm), x.dtype)],
            compiler_params=cp, interpret=interpret,
        )(x, *args)

    xp = _space_to_depth(x)
    return pl.pallas_call(
        _bottleneck_down_s2_kernel,
        grid=(N // B,),
        in_specs=[pl.BlockSpec((2, 2, B, Ho, Wo, Cin),
                               lambda i: (0, 0, i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=out_spec, out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 2, B, Ho + 1, Wo + 1, Cm), x.dtype)],
        compiler_params=cp, interpret=interpret,
    )(xp, *args)


def bottleneck_down_reference(x, w1, b1, w2, b2, w3, b3, wd, bd, stride=1):
    """XLA reference for the projection block (parity tests)."""
    from ..core import nn as cnn
    s = stride
    h = jax.nn.relu(cnn.conv2d({'w': w1[None, None], 'b': b1}, x))
    h = jax.nn.relu(cnn.conv2d({'w': w2, 'b': b2}, h, stride=s, padding=1))
    h = cnn.conv2d({'w': w3[None, None], 'b': b3}, h)
    iden = cnn.conv2d({'w': wd[None, None], 'b': bd}, x, stride=s)
    return jax.nn.relu(h + iden)


def _bottleneck_down_int8_kernel(x_ref, w1_ref, m1_ref, b1_ref, w2_ref,
                                 m2_ref, b2_ref, w3_ref, m3_ref, b3_ref,
                                 wd_ref, md_ref, bd_ref, out_ref, h1p_ref):
    """Quantized stride-1 projection bottleneck (see
    _bottleneck_down_kernel + models/quantize.py epilogue math).
    x int8 (B, H, W, Cin) -> out int8 (B, H, W, Cout). Arithmetic on
    the bf16 MXU with f32 accumulation — exact for int8 operands
    (quantize.py docstring)."""
    B, H, W, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    Cm = w1_ref.shape[1]

    x2d = x_ref[:].reshape(B * H * W, Cin).astype(jnp.bfloat16)
    acc = jnp.dot(x2d, w1_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    h1 = jnp.clip(jnp.round(jnp.maximum(acc * m1_ref[:] + b1_ref[:], 0.0)),
                  0, 127).astype(jnp.bfloat16)

    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, 1:H + 1, 1:W + 1, :] = h1.reshape(B, H, W, Cm)

    cols = jnp.concatenate(
        [h1p_ref[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, Cm)
         for dy in range(3) for dx in range(3)], axis=1)
    acc2 = jnp.dot(cols, w2_ref[:].reshape(9 * Cm, Cm).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    h2 = jnp.clip(jnp.round(jnp.maximum(acc2 * m2_ref[:] + b2_ref[:], 0.0)),
                  0, 127).astype(jnp.bfloat16)

    acc3 = jnp.dot(h2, w3_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    y = acc3 * m3_ref[:] + b3_ref[:]

    accd = jnp.dot(x2d, wd_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    iden = accd * md_ref[:] + bd_ref[:]
    out_ref[:] = jnp.clip(jnp.round(jnp.maximum(y + iden, 0.0)), 0, 127
                          ).astype(jnp.int8).reshape(B, H, W, Cout)


def _bottleneck_down_s2_int8_kernel(xp_ref, w1_ref, m1_ref, b1_ref, w2_ref,
                                    m2_ref, b2_ref, w3_ref, m3_ref, b3_ref,
                                    wd_ref, md_ref, bd_ref, out_ref,
                                    h1p_ref):
    """Quantized stride-2 projection bottleneck on space-to-depth parity
    planes (see _bottleneck_down_s2_kernel). xp int8
    (2, 2, B, Ho, Wo, Cin) -> out int8 (B, Ho, Wo, Cout)."""
    _, _, B, Ho, Wo, Cin = xp_ref.shape
    Cout = out_ref.shape[-1]
    Cm = w1_ref.shape[1]

    x2d = xp_ref[:].reshape(4 * B * Ho * Wo, Cin).astype(jnp.bfloat16)
    acc = jnp.dot(x2d, w1_ref[:].astype(jnp.bfloat16),
                  preferred_element_type=jnp.float32)
    h1 = jnp.clip(jnp.round(jnp.maximum(acc * m1_ref[:] + b1_ref[:], 0.0)),
                  0, 127).astype(jnp.bfloat16)

    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, :, :, 1:, 1:, :] = h1.reshape(2, 2, B, Ho, Wo, Cm)

    cols = []
    for dy in range(3):
        a, sy = _S2_PLANE[dy]
        for dx in range(3):
            b, sx = _S2_PLANE[dx]
            cols.append(h1p_ref[a, b, :, sy:sy + Ho, sx:sx + Wo, :]
                        .reshape(B * Ho * Wo, Cm))
    acc2 = jnp.dot(jnp.concatenate(cols, axis=1),
                   w2_ref[:].reshape(9 * Cm, Cm).astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    h2 = jnp.clip(jnp.round(jnp.maximum(acc2 * m2_ref[:] + b2_ref[:], 0.0)),
                  0, 127).astype(jnp.bfloat16)

    acc3 = jnp.dot(h2, w3_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    y = acc3 * m3_ref[:] + b3_ref[:]

    xs = xp_ref[0, 0].reshape(B * Ho * Wo, Cin).astype(jnp.bfloat16)
    accd = jnp.dot(xs, wd_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    iden = accd * md_ref[:] + bd_ref[:]
    out_ref[:] = jnp.clip(jnp.round(jnp.maximum(y + iden, 0.0)), 0, 127
                          ).astype(jnp.int8).reshape(B, Ho, Wo, Cout)


@functools.partial(jax.jit,
                   static_argnames=('stride', 'interpret', 'batch_tile'))
def fused_bottleneck_down_int8(x, w1, m1, b1, w2, m2, b2, w3, m3, b3,
                               wd, md, bd, stride=1, interpret=False,
                               batch_tile=None):
    """Quantized projection bottleneck. x (N, H, W, Cin) int8; weights
    int8; m*/b* f32 folded per-channel scale/bias (models/quantize.py);
    wd/md/bd the 1x1/s identity projection. Returns int8
    (N, H/s, W/s, Cout)."""
    N, H, W, Cin = x.shape
    Cm = w1.shape[1]
    s = stride
    Ho, Wo = H // s, W // s
    Cout = w3.shape[1]
    if batch_tile is None:
        # int8 in/out blocks (1B), bf16 scratches/cols (2B), f32 accs
        per_img = (2 * H * W * Cin + 2 * Ho * Wo * Cout +
                   (H + 2) * (W + 2) * Cm * 2 +
                   9 * Ho * Wo * Cm * 2 +
                   Ho * Wo * max(Cm, Cout) * 4 + H * W * Cm * 4)
        budget = 72 * 1024 * 1024
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    args = (w1, m1.astype(jnp.float32), b1.astype(jnp.float32),
            w2, m2.astype(jnp.float32), b2.astype(jnp.float32),
            w3, m3.astype(jnp.float32), b3.astype(jnp.float32),
            wd, md.astype(jnp.float32), bd.astype(jnp.float32))
    wspecs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12
    out_spec = pl.BlockSpec((B, Ho, Wo, Cout), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((N, Ho, Wo, Cout), jnp.int8)
    cp = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    if s == 1:
        return pl.pallas_call(
            _bottleneck_down_int8_kernel,
            grid=(N // B,),
            in_specs=[pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)] + wspecs,
            out_specs=out_spec, out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((B, H + 2, W + 2, Cm), jnp.bfloat16)],
            compiler_params=cp, interpret=interpret,
        )(x, *args)

    xp = _space_to_depth(x)
    return pl.pallas_call(
        _bottleneck_down_s2_int8_kernel,
        grid=(N // B,),
        in_specs=[pl.BlockSpec((2, 2, B, Ho, Wo, Cin),
                               lambda i: (0, 0, i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=out_spec, out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 2, B, Ho + 1, Wo + 1, Cm), jnp.bfloat16)],
        compiler_params=cp, interpret=interpret,
    )(xp, *args)
