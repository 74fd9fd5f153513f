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


# identity/stage-kernel input-block budget (bytes per grid step). bt=2 at
# layer1 was tuned under the old 16MB scoped-VMEM default; override via
# the kernels' `bt_budget` argument (bench.py --bt-budget-mb) to re-tune
# under the 100MB limit.
#
# NB: these module globals are DEFAULTS read at trace time; jit caches do
# not key on them, so mutating them after a first call with the same
# shapes silently reuses the stale executable. Library callers should
# pass the explicit `bt_budget` / `iden_cin_cap` arguments instead
# (folding.apply_folded / quantize.apply_folded_v2 thread them through).
BT_BUDGET = 5 * 1024 * 1024

# max conv1 input channels routed to the fused kernels. 512 (= layers
# 1/2 only) was round-1's per-block best, but the device trace shows
# every XLA<->pallas boundary costs a full-tensor relayout copy (XLA
# convs prefer {3,0,2,1}, pallas needs row-major) — lifting the cap to
# 2048 removes all boundaries between stem and pool.
IDEN_CIN_CAP = 512


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

    # padded scratch (zero borders per image; zeroing only at grid step
    # 0 via pl.when measured slightly WORSE — the branch hurts Mosaic's
    # schedule more than the redundant memset costs)
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


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget'))
def fused_bottleneck(x, w1, b1, w2, b2, w3, b3, interpret=False,
                     batch_tile=None, bt_budget=None):
    """Stride-1, groups-1, identity-skip bottleneck block.

    x: (N, H, W, Cin); w1: (Cin, Cm); w2: (3, 3, Cm, Cm) HWIO;
    w3: (Cm, Cin); biases per-channel. Returns (N, H, W, Cin).

    batch_tile: images per grid step (amortises per-step fixed cost and
    widens the matmuls). Default: largest divisor of N whose tile fits
    the `bt_budget` (default BT_BUDGET) input-block byte budget.
    """
    N, H, W, Cin = x.shape
    Cm = w1.shape[1]
    if batch_tile is None:
        # ~5MB input-block budget: bt=2 at layer1 (64^2 x 256), larger for
        # the smaller deep stages; bt>2 at layer1 over-pressures VMEM and
        # loses pipelining (measured).
        per_img = H * W * Cin * x.dtype.itemsize
        budget = BT_BUDGET if bt_budget is None else bt_budget
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


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget'))
def fused_bottleneck_stage(x, w1, b1, w2, b2, w3, b3, interpret=False,
                           batch_tile=None, bt_budget=None):
    """Run K stacked stride-1 bottleneck blocks (weights with a leading
    block axis) in one pallas call: the intermediate activations between
    blocks never touch HBM.

    x: (N, H, W, Cin); w1: (K, Cin, Cm); w2: (K, 3, 3, Cm, Cm);
    w3: (K, Cm, Cin); b*: (K, C)."""
    N, H, W, Cin = x.shape
    K, _, Cm = w1.shape
    if batch_tile is None:
        per_img = H * W * Cin * x.dtype.itemsize
        budget = BT_BUDGET if bt_budget is None else bt_budget
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


def _stage_stream_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                         b3_ref, out_ref, act_ref, h1p_ref):
    """One bottleneck block per grid step k, activations resident.

    grid = (N // B, K): the activation tile lives in `act_ref` scratch
    across the K block steps — the input block is DMA'd once (k == 0,
    same index_map for every k so the pipeline does not refetch) and the
    output written once (k == K - 1). Each step streams only block k's
    weights (leading-axis blocks of the stacked weight arrays), so VMEM
    holds one block's weights at a time — unlike round 1's
    fused_bottleneck_stage whose fully-resident weight stacks starved
    the pipeline at layer3/4 (PERFORMANCE.md round-1 table)."""
    B, H, W, Cin = x_ref.shape
    Cm = w1_ref.shape[2]
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        act_ref[:] = x_ref[:]

    cur = act_ref[:].reshape(B * H * W, Cin)
    h1 = jnp.dot(cur, w1_ref[0], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[k], 0.0).astype(cur.dtype)
    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, 1:H + 1, 1:W + 1, :] = h1.reshape(B, H, W, Cm)
    cols = jnp.concatenate(
        [h1p_ref[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, Cm)
         for dy in range(3) for dx in range(3)], axis=1)
    acc = jnp.dot(cols, w2_ref[0].reshape(9 * Cm, Cm),
                  preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[k], 0.0).astype(cur.dtype)
    out = jnp.dot(h2, w3_ref[0], preferred_element_type=jnp.float32)
    out = out + b3_ref[k] + cur.astype(jnp.float32)
    new = jnp.maximum(out, 0.0).astype(cur.dtype).reshape(B, H, W, Cin)
    act_ref[:] = new

    @pl.when(k == nk - 1)
    def _():
        out_ref[:] = new


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget'))
def fused_bottleneck_stage_stream(x, w1, b1, w2, b2, w3, b3,
                                  interpret=False, batch_tile=None,
                                  bt_budget=None):
    """K stacked stride-1 identity bottlenecks in ONE pallas call with
    VMEM-resident activations and grid-streamed per-block weights: one
    HBM read and one write per stage segment regardless of K, and no
    XLA<->pallas boundary relayouts between blocks.

    x: (N, H, W, Cin); w1: (K, Cin, Cm); w2: (K, 3, 3, Cm, Cm);
    w3: (K, Cm, Cin); b*: (K, C)."""
    N, H, W, Cin = x.shape
    K, _, Cm = w1.shape
    if batch_tile is None:
        per_img = H * W * Cin * x.dtype.itemsize
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    return pl.pallas_call(
        _stage_stream_kernel,
        grid=(N // B, K),
        in_specs=[
            pl.BlockSpec((B, H, W, Cin), lambda n, k: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            # weights stream per k (leading-axis blocks: last two dims
            # match the array, so the (8, 128) block rule is satisfied);
            # the tiny (K, C) biases stay fully resident — a (1, C)
            # block would violate the sublane-divisibility rule
            pl.BlockSpec((1, Cin, Cm), lambda n, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, Cm, Cm), lambda n, k: (k, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cm, Cin), lambda n, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, H, W, Cin), lambda n, k: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((B, H, W, Cin), x.dtype),
                        pltpu.VMEM((B, H + 2, W + 2, Cm), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32))


def _rq8(acc_i32, m, b):
    """int32 accumulator -> requantized int8 (post-relu one-sided).
    The relu is subsumed by the clip's 0 lower bound — no separate
    maximum pass."""
    y = acc_i32.astype(jnp.float32) * m + b
    return jnp.clip(jnp.round(y), 0, 127).astype(jnp.int8)


def _zero_border(ref):
    """Zero ONLY the 1-element padded border of an (H+2, W+2, B, C) hwnc
    conv scratch. The conv1 phase overwrites the full interior every
    grid step, so a zeros_like fill of the whole plane doubles the h1
    store traffic for nothing."""
    h2, w2 = ref.shape[0], ref.shape[1]
    zr = jnp.zeros((1,) + ref.shape[1:], ref.dtype)
    ref[0:1] = zr
    ref[h2 - 1:h2] = zr
    zc = jnp.zeros((h2, 1) + ref.shape[2:], ref.dtype)
    ref[:, 0:1] = zc
    ref[:, w2 - 1:w2] = zc


def _zero_border_s2(ref):
    """Zero only row 0 / col 0 of an (Ho+1, Wo+1, B, C) parity-plane
    scratch (the conv1 scatter writes rows 1..Ho, cols 1..Wo)."""
    ref[0:1] = jnp.zeros((1,) + ref.shape[1:], ref.dtype)
    ref[:, 0:1] = jnp.zeros((ref.shape[0], 1) + ref.shape[2:], ref.dtype)


def _conv2_band(h1p_ref, w2_ref, y0, rb, mode, acc_dtype=jnp.float32):
    """One row band of the 3x3 stride-1 conv over the padded (H+2, W+2,
    B, Cm) scratch -> f32 (rb*W*B, Cm) pre-bias accumulator. Shared by
    the identity and down1 hwnc kernels so the strategies stay in
    lockstep.

    mode:
      'im2col'    — one K=9*Cm matmul over a materialized cols buffer;
      'scatter'   — ONE full-width matmul (N = 9*Cm lanes) over the
                    padded band, then 9 shifted adds: out[y, x] =
                    sum_taps P[y+dy, x+dx, tap]. At Cm=64 (layer1) the
                    im2col matmul's N=64 runs the MXU at half width;
                    this runs full width at the cost of the
                    (rb+2)(W+2)/(rb*W) padded-band overhang;
      'scatter16' — scatter with the tap products stored bf16 (halves
                    the VPU read traffic of the shifted adds; the f32
                    accumulate of bf16-rounded taps can flip boundary
                    round() ties 1 LSB);
      'acc'       — 9 accumulating K=Cm matmuls, no materialized cols
                    buffer (trades MXU contraction depth for the
                    concat's VMEM shuffle traffic).
    """
    W = h1p_ref.shape[1] - 2
    B, Cm = h1p_ref.shape[2], h1p_ref.shape[3]
    if mode == 'im2col':
        cols = jnp.concatenate(
            [h1p_ref[y0 + dy:y0 + dy + rb, dx:dx + W, :, :].reshape(
                rb * W * B, Cm)
             for dy in range(3) for dx in range(3)], axis=1)
        return jnp.dot(cols, w2_ref[:].reshape(9 * Cm, Cm),
                       preferred_element_type=acc_dtype)
    if mode in ('scatter', 'scatter16'):
        assert acc_dtype == jnp.float32 or mode != 'scatter16', \
            'scatter16 (bf16 taps) is a float-compute mode'
        w2sc = jnp.concatenate(
            [w2_ref[dy, dx] for dy in range(3) for dx in range(3)],
            axis=1)                                         # (Cm, 9*Cm)
        pband = h1p_ref[y0:y0 + rb + 2].reshape(
            (rb + 2) * (W + 2) * B, Cm)
        P = jnp.dot(pband, w2sc, preferred_element_type=acc_dtype)
        if mode == 'scatter16':
            P = P.astype(jnp.bfloat16)
        P = P.reshape(rb + 2, W + 2, B, 9 * Cm)
        acc = None
        for dy in range(3):
            for dx in range(3):
                tp = (dy * 3 + dx) * Cm
                sl = P[dy:dy + rb, dx:dx + W, :, tp:tp + Cm].reshape(
                    rb * W * B, Cm)
                acc = sl.astype(acc_dtype) if acc is None else acc + sl
        return acc
    assert mode == 'acc', mode
    acc = None
    for dy in range(3):
        for dx in range(3):
            sl = h1p_ref[y0 + dy:y0 + dy + rb,
                         dx:dx + W, :, :].reshape(rb * W * B, Cm)
            d = jnp.dot(sl, w2_ref[dy, dx],
                        preferred_element_type=acc_dtype)
            acc = d if acc is None else acc + d
    return acc


def _conv2_band_budget(bb, W, B, Cm, tail_bytes, mode):
    """Rows-per-band byte accounting for _conv2_band + a kernel's f32
    tail (`tail_bytes` per output row): returns the adjusted budget and
    per-row cost. Shared by the identity and down1 hwnc wrappers."""
    if mode in ('scatter', 'scatter16'):
        pb = 4 if mode == 'scatter' else 2
        per_row = (W + 2) * B * 9 * Cm * pb + tail_bytes
        bb = max(per_row, bb - 2 * (W + 2) * B * 9 * Cm * pb)
    elif mode == 'acc':
        per_row = W * B * Cm * 4 + tail_bytes
    else:
        per_row = W * B * 9 * Cm * 2 + tail_bytes
    return bb, per_row


def _bottleneck_int8_kernel(x_ref, w1_ref, m1_ref, b1_ref, w2_ref, m2_ref,
                            b2_ref, w3_ref, m3_ref, b3_ref, sxr_ref,
                            out_ref, h1p_ref):
    """int8-I/O bottleneck: x int8 (B,H,W,Cin) -> out int8 same shape.

    HBM traffic halves vs the bf16 kernel and all three matmuls run as
    NATIVE int8 x int8 -> int32 on the MXU (2x the bf16 rate, verified
    exact on device) — no operand casts; intermediates are stored int8
    in VMEM. Results are bit-identical to the XLA int8 oracle
    (models/quantize.py): int32 accumulation is exact and the requant
    epilogues use the same f32 mul/add/round/clip.

    w* int8; m* f32 per-out-channel (s_in*s_w*r_out folded); b* f32
    (bias*r_out folded); sxr (1,1) f32 = s_x*r_out for the residual.
    """
    B, H, W, Cin = x_ref.shape
    Cm = w1_ref.shape[1]

    x2d = x_ref[:].reshape(B * H * W, Cin)

    acc = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.int32)
    h1 = _rq8(acc, m1_ref[:], b1_ref[:])

    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, 1:H + 1, 1:W + 1, :] = h1.reshape(B, H, W, Cm)

    cols = jnp.concatenate(
        [h1p_ref[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, Cm)
         for dy in range(3) for dx in range(3)], axis=1)
    acc2 = jnp.dot(cols, w2_ref[:].reshape(9 * Cm, Cm),
                   preferred_element_type=jnp.int32)
    h2 = _rq8(acc2, m2_ref[:], b2_ref[:])

    acc3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
    out = (acc3.astype(jnp.float32) * m3_ref[:] + b3_ref[:] +
           x2d.astype(jnp.float32) * sxr_ref[0, 0])
    out_ref[:] = jnp.clip(jnp.round(out), 0, 127
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
        scratch_shapes=[pltpu.VMEM((B, H + 2, W + 2, Cm), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, m1.astype(jnp.float32), b1.astype(jnp.float32),
      w2, m2.astype(jnp.float32), b2.astype(jnp.float32),
      w3, m3.astype(jnp.float32), b3.astype(jnp.float32),
      jnp.asarray(sxr, jnp.float32).reshape(1, 1))


def _bottleneck_i8v2_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                            b3_ref, r_ref, out_ref, h1p_ref):
    """Boundary-int8 bottleneck: int8 HBM I/O, bf16/f32 internal compute.

    Round-2's fully-quantized kernel lost to bf16 (PERFORMANCE.md int8
    post-mortem): the per-element f32 requant epilogues run serially on
    the VPU and every 1-offset slice of packed s8 data is a sublane
    shuffle. This variant keeps int8 ONLY as the HBM storage format
    (half the inter-block traffic): the input tile is cast once to the
    compute dtype (weights' dtype), the whole block runs exactly like
    the bf16 kernel, and one round/clip/cast quantizes the output tile.

    x (B, H, W, Cin) int8 OR float carrying the same quantized integer
    values (0..127 are exact in bf16, so storage dtype does not change
    the math — float I/O between consecutive kernels skips the packed-s8
    sublane conversions); w1 (Cin, Cm) compute-dtype with the input
    scale s_in folded in; w2 (3,3,Cm,Cm); w3 (Cm, Cin) with 1/s_out
    folded; b* f32 (b3 pre-divided by s_out); r (1,1) f32 = s_in/s_out
    for the residual. Output dtype follows out_ref (int8 or compute).
    See models/quantize.py:quantize_folded_v2 for the scale algebra.
    """
    B, H, W, Cin = x_ref.shape
    Cm = w1_ref.shape[1]
    cdt = w1_ref.dtype

    x2d = x_ref[:].reshape(B * H * W, Cin).astype(cdt)

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
    out = out + b3_ref[:] + x2d.astype(jnp.float32) * r_ref[0, 0]
    q = jnp.clip(jnp.round(out), 0.0, 127.0)
    out_ref[:] = q.astype(out_ref.dtype).reshape(B, H, W, Cin)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget',
                                    'out_int8'))
def fused_bottleneck_i8v2(x, w1, b1, w2, b2, w3, b3, r, interpret=False,
                          batch_tile=None, bt_budget=None, out_int8=True):
    """Boundary-int8 stride-1 identity bottleneck (quantized-value I/O,
    float compute — see _bottleneck_i8v2_kernel). x (N, H, W, Cin) int8
    or compute-dtype with quantized integer values; w1 (Cin, Cm) /
    w2 (3,3,Cm,Cm) / w3 (Cm, Cin) in the compute dtype (bf16 serving,
    f32 tests); b* f32; r f32 scalar. out_int8=False stores the output
    in the compute dtype (same integer values, no s8 repacking) for
    kernel-to-kernel hops."""
    N, H, W, Cin = x.shape
    Cm = w1.shape[1]
    if batch_tile is None:
        # VMEM is dominated by the same bf16 internals as the bf16
        # kernel (h1p, cols, accumulators) — size the tile as if the
        # input were bf16 so both kernels pipeline identically.
        per_img = H * W * Cin * 2
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    return pl.pallas_call(
        _bottleneck_i8v2_kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            x.shape, jnp.int8 if out_int8 else w1.dtype),
        scratch_shapes=[pltpu.VMEM((B, H + 2, W + 2, Cm), w1.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32), jnp.asarray(r, jnp.float32).reshape(1, 1))


def _bottleneck_down_i8v2_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                                 w3_ref, b3_ref, wd_ref, bd_ref, out_ref,
                                 h1p_ref):
    """Boundary-int8 stride-1 projection bottleneck (ResNet-50
    layer1[0]): quantized-value I/O, float compute — the v2 analogue of
    _bottleneck_down_kernel. Scale algebra per
    models/quantize.py:quantize_folded_v2 ('down' entry: w *=
    s_in/s_out, b /= s_out)."""
    B, H, W, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    Cm = w1_ref.shape[1]
    cdt = w1_ref.dtype

    x2d = x_ref[:].reshape(B * H * W, Cin).astype(cdt)
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
    q = jnp.clip(jnp.round(out), 0.0, 127.0)
    out_ref[:] = q.astype(out_ref.dtype).reshape(B, H, W, Cout)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget',
                                    'out_int8'))
def fused_bottleneck_down_i8v2(x, w1, b1, w2, b2, w3, b3, wd, bd,
                               interpret=False, batch_tile=None,
                               bt_budget=None, out_int8=True):
    """v2 stride-1 projection bottleneck: x (N, H, W, Cin) int8 or
    quantized-value float; weights compute-dtype with boundary scales
    folded (quantize_folded_v2); wd/bd the 1x1 projection. Returns
    (N, H, W, Cout) int8 or compute-dtype."""
    N, H, W, Cin = x.shape
    Cm = w1.shape[1]
    Cout = w3.shape[1]
    if batch_tile is None:
        per_img = H * W * max(Cin, Cout) * 2
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    return pl.pallas_call(
        _bottleneck_down_i8v2_kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, H, W, Cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((B, H, W, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (N, H, W, Cout), jnp.int8 if out_int8 else w1.dtype),
        scratch_shapes=[pltpu.VMEM((B, H + 2, W + 2, Cm), w1.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32), wd, bd.astype(jnp.float32))


def _bottleneck_i8v2_hwnc_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                                 w3_ref, b3_ref, r_ref, out_ref, h1p_ref,
                                 *, bands, conv2_mode='im2col',
                                 pipeline=False):
    """Layout-native v2 identity bottleneck: operates on the (H, W, N, C)
    view, whose row-major layout equals XLA's preferred {3,0,2,1} conv
    layout on (N, H, W, C) — entering/leaving the kernel is a layout
    bitcast, not a relayout copy (the tax that sank the NHWC v2 kernels,
    PERFORMANCE.md round 3). The batch rides the SUBLANE-adjacent dim:
    blocks are (H, W, B, C) slices of the N axis.

    Compute is chunked into `bands` row bands so the large temporaries
    (im2col cols, the f32 conv3+residual tail) are per-band: the
    unchunked form peaks at 108.29M scoped VMEM at layer1 even with
    B=8 (> the ~104.5M limit, measured on-device)."""
    H, W, B, Cin = x_ref.shape
    Cm = w1_ref.shape[1]
    cdt = w1_ref.dtype
    rb = H // bands

    # conv1 per band, relu'd straight into the padded scratch — bounds
    # the f32 dot output and the bf16 cast of the s8 input
    _zero_border(h1p_ref)

    def c1(t):
        y0 = t * rb
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin).astype(cdt)
        h1 = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)
        h1p_ref[1 + y0:1 + y0 + rb, 1:W + 1, :, :] = h1.reshape(
            rb, W, B, Cm)

    def c23(t):
        y0 = t * rb
        # output row y's dy tap reads padded row y + dy (pad offset 1)
        acc = _conv2_band(h1p_ref, w2_ref, y0, rb, conv2_mode)
        h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(cdt)

        out = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin)
        out = out + b3_ref[:] + xb.astype(jnp.float32) * r_ref[0, 0]
        q = jnp.clip(jnp.round(out), 0.0, 127.0)
        out_ref[y0:y0 + rb] = q.astype(out_ref.dtype).reshape(
            rb, W, B, Cin)

    if pipeline:
        # software pipelining: conv2(t) reads h1p rows up to y0+rb+1,
        # i.e. the first row of band t+1's conv1 output — so emit
        # conv1(t+2) between conv2/3 epilogues, giving Mosaic an
        # independent MXU dot to overlap with each band's VPU tail
        c1(0)
        if bands > 1:
            c1(1)
        for t in range(bands):
            if t + 2 < bands:
                c1(t + 2)
            c23(t)
    else:
        for t in range(bands):
            c1(t)
        for t in range(bands):
            c23(t)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget',
                                    'out_int8', 'bands', 'band_budget',
                                    'conv2_mode', 'pipeline'))
def fused_bottleneck_i8v2_hwnc(x, w1, b1, w2, b2, w3, b3, r,
                               interpret=False, batch_tile=None,
                               bt_budget=None, out_int8=True, bands=None,
                               band_budget=None, conv2_mode='im2col',
                               pipeline=False):
    """v2 identity bottleneck on the (H, W, N, Cin) view (= XLA's
    preferred layout of the NHWC activations, so no boundary relayout).
    x int8 or quantized-value float; weights compute-dtype with the v2
    boundary scales folded; r f32 scalar. Returns (H, W, N, Cin)."""
    H, W, N, Cin = x.shape
    Cm = w1.shape[1]
    ib = x.dtype.itemsize
    ob = 1 if out_int8 else w1.dtype.itemsize
    if batch_tile is None:
        # the N axis is second-minor, so the block's (B, Cin) tail must
        # have B % 8 == 0 (or B == N); steady-state VMEM is the
        # double-buffered in/out windows + the padded scratch (the band
        # temporaries are bounded separately below). Account actual I/O
        # dtype bytes: with float inter-kernel IO the input window is
        # bf16, not s8 (a fixed *2*2 under-budgeted that case by ~716K
        # past the scoped-vmem ceiling at layer1).
        per_img = H * W * Cin * (ib + ob) * 2
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = min(32, max(8, (budget // max(per_img, 1)) // 8 * 8))
        while batch_tile > 0 and N % batch_tile:
            batch_tile -= 8
        if batch_tile <= 0:
            batch_tile = N   # N < 8 or not a multiple of 8: whole axis
    B = batch_tile
    assert N % B == 0 and (B % 8 == 0 or B == N), (N, B)
    if bands is None:
        # rows per band so cols (9*Cm bf16) + f32 tail (2*Cin f32) stay
        # bounded; unchunked the kernel peaks at 108.29M scoped (OOM).
        # band_budget trades scoped VMEM for fewer, larger band
        # iterations (bench --band-budget-mb). bf16-in AND bf16-out
        # (both neighbours pallas, e.g. layer1[1] after the down1
        # kernel) doubles the double-buffered windows vs the measured
        # default chain; at layer1 size that overflowed the ~104.5M
        # scoped ceiling by 716K with 6M bands — shrink the band budget
        # for oversized windows only, leaving the measured-best default
        # operating point untouched.
        if band_budget is not None:
            bb = band_budget
        else:
            # default layer1 windows: s8/bf16 50.3M (measured fine);
            # the OOM case bf16/bf16 is 67.1M -> threshold between
            win = H * W * B * Cin * (ib + ob) * 2
            bb = (6 if win <= 56 * 1024 * 1024 else 4) * 1024 * 1024
        tail = W * B * Cin * 8                    # f32 conv3+residual
        if pipeline:
            # conv1(t+2) temporaries (bf16 xb + f32 h1 dot + cast) are
            # live concurrently with band t's c23 tail
            tail += W * B * (Cin * 2 + Cm * 6)
        bb, per_row = _conv2_band_budget(bb, W, B, Cm, tail, conv2_mode)
        rb = max(1, bb // max(per_row, 1))
        while H % rb:
            rb -= 1
        bands = H // rb
    assert H % bands == 0, (H, bands)

    return pl.pallas_call(
        functools.partial(_bottleneck_i8v2_hwnc_kernel, bands=bands,
                          conv2_mode=conv2_mode, pipeline=pipeline),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 + [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            x.shape, jnp.int8 if out_int8 else w1.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, B, Cm), w1.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32), jnp.asarray(r, jnp.float32).reshape(1, 1))


def _bottleneck_down_i8v2_hwnc_kernel(x_ref, w1_ref, b1_ref, w2_ref,
                                      b2_ref, w3_ref, b3_ref, wd_ref,
                                      bd_ref, out_ref, h1p_ref, *, bands,
                                      conv2_mode='im2col'):
    """Layout-native v2 stride-1 PROJECTION bottleneck (ResNet-50
    layer1[0], reference resnet_cls.py Bottleneck-with-downsample) on
    the (H, W, B, C) view: like _bottleneck_i8v2_hwnc_kernel but the
    residual is a 1x1 channel projection (wd: Cin -> Cout) and
    Cout != Cin. Replaces the XLA layer1[0] block AND its s8
    clamp_convert epilogue (5.8 ms at serving batch in the round-3
    trace) with zero boundary relayouts.

    conv3 + the projection run as ONE K-packed matmul
    [h2 | x] @ [[w3], [wd]]: at layer1 each alone is a K=64 half-depth
    contraction; packed it is K=128 full depth AND the residual add
    comes out of the MXU for free."""
    H, W, B, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    Cm = w1_ref.shape[1]
    cdt = w1_ref.dtype
    rb = H // bands

    _zero_border(h1p_ref)
    for t in range(bands):
        y0 = t * rb
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin).astype(cdt)
        h1 = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)
        h1p_ref[1 + y0:1 + y0 + rb, 1:W + 1, :, :] = h1.reshape(
            rb, W, B, Cm)

    w3d = jnp.concatenate([w3_ref[:], wd_ref[:]], axis=0)  # (Cm+Cin, Co)
    for t in range(bands):
        y0 = t * rb
        acc = _conv2_band(h1p_ref, w2_ref, y0, rb, conv2_mode)
        h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(cdt)

        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin).astype(cdt)
        out = jnp.dot(jnp.concatenate([h2, xb], axis=1), w3d,
                      preferred_element_type=jnp.float32)
        out = out + b3_ref[:] + bd_ref[:]
        q = jnp.clip(jnp.round(out), 0.0, 127.0)
        out_ref[y0:y0 + rb] = q.astype(out_ref.dtype).reshape(
            rb, W, B, Cout)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget',
                                    'out_int8', 'bands', 'band_budget',
                                    'conv2_mode'))
def fused_bottleneck_down_i8v2_hwnc(x, w1, b1, w2, b2, w3, b3, wd, bd,
                                    interpret=False, batch_tile=None,
                                    bt_budget=None, out_int8=True,
                                    bands=None, band_budget=None,
                                    conv2_mode='im2col'):
    """v2 stride-1 projection bottleneck on the (H, W, N, Cin) view ->
    (H, W, N, Cout). Scale algebra per quantize_folded_v2's 'down'
    entry; layout/VMEM story per fused_bottleneck_i8v2_hwnc."""
    H, W, N, Cin = x.shape
    Cm = w1.shape[1]
    Cout = w3.shape[1]
    if batch_tile is None:
        ib = x.dtype.itemsize
        ob = 1 if out_int8 else w1.dtype.itemsize
        per_img = H * W * (Cin * ib + Cout * ob) * 2
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = min(32, max(8, (budget // max(per_img, 1)) // 8 * 8))
        while batch_tile > 0 and N % batch_tile:
            batch_tile -= 8
        if batch_tile <= 0:
            batch_tile = N
    B = batch_tile
    assert N % B == 0 and (B % 8 == 0 or B == N), (N, B)
    if bands is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        bb, per_row = _conv2_band_budget(bb, W, B, Cm, W * B * Cout * 8,
                                         conv2_mode)
        rb = max(1, bb // max(per_row, 1))
        while H % rb:
            rb -= 1
        bands = H // rb
    assert H % bands == 0, (H, bands)

    return pl.pallas_call(
        functools.partial(_bottleneck_down_i8v2_hwnc_kernel, bands=bands,
                          conv2_mode=conv2_mode),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((H, W, B, Cout), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (H, W, N, Cout), jnp.int8 if out_int8 else w1.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, B, Cm), w1.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32), wd, bd.astype(jnp.float32))


def _bottleneck_down_s2_i8v2_hwnc_kernel(x_ref, w1_ref, b1_ref, w2_ref,
                                         b2_ref, w3_ref, b3_ref, wd_ref,
                                         bd_ref, out_ref, pee_ref,
                                         peo_ref, poe_ref, poo_ref, *,
                                         bands_in, bands_out):
    """Layout-native v2 STRIDE-2 projection bottleneck (reference
    resnet_cls.py Bottleneck with stride-2 conv2 + stride-2 1x1
    downsample — layer2[0]/layer3[0]/layer4[0]) on the (H, W, B, C)
    view: (H, W, B, Cin) -> (H/2, W/2, B, Cout).

    conv1 (1x1 s1) output is scattered into FOUR parity-plane
    scratches with built-in (+1, +1) zero padding:
      P<rp><cp>[1 + r//2, 1 + c//2] = h1[r, c]  (r%2==rp, c%2==cp)
    so the stride-2 3x3 conv2 (pad 1) becomes 9 contiguous plane
    slices — output (y', x') tap (dy, dx) reads input
    (2y'+dy-1, 2x'+dx-1), i.e. plane (dy&1^1, dx&1^1) at offset
    (dy+1)//2, (dx+1)//2 — no strided VMEM loads. Replaces the XLA
    projection block AND its s8 quantize epilogue with zero boundary
    relayouts (together ~21 ms of the 122 ms serving step in the
    round-3 trace)."""
    H, W, B, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    Ho, Wo = H // 2, W // 2
    Cm = w1_ref.shape[1]
    cdt = w1_ref.dtype
    rb = H // bands_in
    rbo = Ho // bands_out

    for p in (pee_ref, peo_ref, poe_ref, poo_ref):
        _zero_border_s2(p)
    for t in range(bands_in):
        y0 = t * rb
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin).astype(cdt)
        h1 = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)
        # split row/col parities via axis-split reshape + unit slices
        # (no strided vector ops)
        h1 = h1.reshape(rb // 2, 2, Wo, 2, B, Cm)
        k0 = 1 + y0 // 2
        pee_ref[k0:k0 + rb // 2, 1:1 + Wo] = h1[:, 0, :, 0]
        peo_ref[k0:k0 + rb // 2, 1:1 + Wo] = h1[:, 0, :, 1]
        poe_ref[k0:k0 + rb // 2, 1:1 + Wo] = h1[:, 1, :, 0]
        poo_ref[k0:k0 + rb // 2, 1:1 + Wo] = h1[:, 1, :, 1]

    # tap (dy, dx) -> (plane row-parity, row offset) per the padding
    # algebra above: dy=0 -> odd rows at y', dy=1 -> even at 1+y',
    # dy=2 -> odd at 1+y' (same for dx/columns)
    sel = {0: ('o', 0), 1: ('e', 1), 2: ('o', 1)}
    planes = {('e', 'e'): pee_ref, ('e', 'o'): peo_ref,
              ('o', 'e'): poe_ref, ('o', 'o'): poo_ref}
    w2f = w2_ref[:].reshape(9 * Cm, Cm)
    # conv3 + projection as ONE K-packed matmul [h2 | x_s2] @ [[w3],[wd]]
    # (K = Cm + Cin, lane-aligned at every stage) — the residual add
    # comes out of the MXU for free instead of a separate dot + VPU add
    w3d = jnp.concatenate([w3_ref[:], wd_ref[:]], axis=0)
    for t in range(bands_out):
        y0 = t * rbo
        taps = []
        for dy in range(3):
            rp, ro = sel[dy]
            for dx in range(3):
                cp, co = sel[dx]
                p = planes[(rp, cp)]
                taps.append(p[ro + y0:ro + y0 + rbo,
                              co:co + Wo].reshape(rbo * Wo * B, Cm))
        cols = jnp.concatenate(taps, axis=1)
        acc = jnp.dot(cols, w2f, preferred_element_type=jnp.float32)
        h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(cdt)

        # residual: 1x1 stride-2 projection reads x[2y', 2x']
        xb = x_ref[2 * y0:2 * y0 + 2 * rbo].reshape(
            rbo, 2, Wo, 2, B, Cin)[:, 0, :, 0]
        xb = xb.reshape(rbo * Wo * B, Cin).astype(cdt)
        out = jnp.dot(jnp.concatenate([h2, xb], axis=1), w3d,
                      preferred_element_type=jnp.float32)
        out = out + b3_ref[:] + bd_ref[:]
        q = jnp.clip(jnp.round(out), 0.0, 127.0)
        out_ref[y0:y0 + rbo] = q.astype(out_ref.dtype).reshape(
            rbo, Wo, B, Cout)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget',
                                    'out_int8', 'bands_in', 'bands_out',
                                    'band_budget'))
def fused_bottleneck_down_s2_i8v2_hwnc(x, w1, b1, w2, b2, w3, b3, wd, bd,
                                       interpret=False, batch_tile=None,
                                       bt_budget=None, out_int8=True,
                                       bands_in=None, bands_out=None,
                                       band_budget=None):
    """v2 stride-2 projection bottleneck on the (H, W, N, Cin) view ->
    (H/2, W/2, N, Cout). Scale algebra per quantize_folded_v2's 'down'
    entry; parity-plane conv2 per the kernel docstring."""
    H, W, N, Cin = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    Cm = w1.shape[1]
    Cout = w3.shape[1]
    Ho, Wo = H // 2, W // 2
    if batch_tile is None:
        ib = x.dtype.itemsize
        ob = 1 if out_int8 else w1.dtype.itemsize
        per_img = (H * W * Cin * ib + Ho * Wo * Cout * ob) * 2
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = min(32, max(8, (budget // max(per_img, 1)) // 8 * 8))
        while batch_tile > 0 and N % batch_tile:
            batch_tile -= 8
        if batch_tile <= 0:
            batch_tile = N
    B = batch_tile
    assert N % B == 0 and (B % 8 == 0 or B == N), (N, B)
    if bands_in is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        per_row = W * B * (Cin * 2 + Cm * 6)     # xb bf16 + h1 f32/bf16
        rb = max(2, (bb // max(per_row, 1)) // 2 * 2)
        while H % rb or rb % 2:
            rb -= 2
        rb = max(rb, 2)
        bands_in = H // rb
    if bands_out is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        per_row = Wo * B * (9 * Cm * 2 + Cout * 8 + Cin * 2)
        rbo = max(1, bb // max(per_row, 1))
        while Ho % rbo:
            rbo -= 1
        bands_out = Ho // rbo
    assert H % bands_in == 0 and (H // bands_in) % 2 == 0, (H, bands_in)
    assert Ho % bands_out == 0, (Ho, bands_out)

    return pl.pallas_call(
        functools.partial(_bottleneck_down_s2_i8v2_hwnc_kernel,
                          bands_in=bands_in, bands_out=bands_out),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((Ho, Wo, B, Cout), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (Ho, Wo, N, Cout), jnp.int8 if out_int8 else w1.dtype),
        scratch_shapes=[pltpu.VMEM((Ho + 1, Wo + 1, B, Cm), w1.dtype)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32), wd, bd.astype(jnp.float32))


def _bottleneck_int8_hwnc_kernel(x_ref, w1_ref, m1_ref, b1_ref, w2_ref,
                                 m2_ref, b2_ref, w3_ref, m3_ref, b3_ref,
                                 sxr_ref, out_ref, h1p_ref, *, bands,
                                 conv2_mode='im2col', pipeline=False):
    """Full-int8 identity bottleneck on the (H, W, B, C) view: the
    round-2 int8c math (_bottleneck_int8_kernel — native s8 x s8 -> s32
    MXU dots + f32 requant epilogues, bit-identical to the XLA int8
    oracle in models/quantize.py) in the layout-native hwnc form.

    The round-2 NHWC int8 kernels lost to bf16 (19.4 vs 9.2 ms at
    layer1; PERFORMANCE.md int8 post-mortem) on packed-s8 sublane
    shuffles: their im2col slices cut across the tiled minor dims.
    Here the 3x3 taps slice H/W (major dims), the (B, C) tile is
    untouched, and entry/exit transposes are layout bitcasts — while
    the s8 MXU runs at 2x the bf16 rate."""
    H, W, B, Cin = x_ref.shape
    Cm = w1_ref.shape[1]
    rb = H // bands

    _zero_border(h1p_ref)

    def c1(t):
        y0 = t * rb
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin)
        acc = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.int32)
        h1p_ref[1 + y0:1 + y0 + rb, 1:W + 1, :, :] = _rq8(
            acc, m1_ref[:], b1_ref[:]).reshape(rb, W, B, Cm)

    def c23(t):
        y0 = t * rb
        acc2 = _conv2_band(h1p_ref, w2_ref, y0, rb, conv2_mode,
                           acc_dtype=jnp.int32)
        h2 = _rq8(acc2, m2_ref[:], b2_ref[:])
        acc3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin)
        out = (acc3.astype(jnp.float32) * m3_ref[:] + b3_ref[:] +
               xb.astype(jnp.float32) * sxr_ref[0, 0])
        out_ref[y0:y0 + rb] = jnp.clip(
            jnp.round(out), 0, 127
        ).astype(jnp.int8).reshape(rb, W, B, Cin)

    if pipeline:
        c1(0)
        if bands > 1:
            c1(1)
        for t in range(bands):
            if t + 2 < bands:
                c1(t + 2)
            c23(t)
    else:
        for t in range(bands):
            c1(t)
        for t in range(bands):
            c23(t)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget',
                                    'bands', 'band_budget', 'conv2_mode',
                                    'pipeline'))
def fused_bottleneck_int8_hwnc(x, w1, m1, b1, w2, m2, b2, w3, m3, b3,
                               sxr, interpret=False, batch_tile=None,
                               bt_budget=None, bands=None,
                               band_budget=None, conv2_mode='im2col',
                               pipeline=False):
    """int8c identity bottleneck on the (H, W, N, Cin) int8 view ->
    int8 same shape. Args per fused_bottleneck_int8 (w* s8, m*/b* f32
    per-channel folded scale/bias, sxr f32 scalar); layout/VMEM story
    per fused_bottleneck_i8v2_hwnc."""
    H, W, N, Cin = x.shape
    Cm = w1.shape[1]
    if batch_tile is None:
        per_img = H * W * Cin * 2 * 2       # s8 in + s8 out, dbuffered
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = min(32, max(8, (budget // max(per_img, 1)) // 8 * 8))
        while batch_tile > 0 and N % batch_tile:
            batch_tile -= 8
        if batch_tile <= 0:
            batch_tile = N
    B = batch_tile
    assert N % B == 0 and (B % 8 == 0 or B == N), (N, B)
    if bands is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        per_row = W * B * (9 * Cm + Cin * 8)
        rb = max(1, bb // max(per_row, 1))
        while H % rb:
            rb -= 1
        bands = H // rb
    assert H % bands == 0, (H, bands)

    return pl.pallas_call(
        functools.partial(_bottleneck_int8_hwnc_kernel, bands=bands,
                          conv2_mode=conv2_mode, pipeline=pipeline),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 + [
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.int8),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, B, Cm), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, m1.astype(jnp.float32), b1.astype(jnp.float32),
      w2, m2.astype(jnp.float32), b2.astype(jnp.float32),
      w3, m3.astype(jnp.float32), b3.astype(jnp.float32),
      jnp.asarray(sxr, jnp.float32).reshape(1, 1))


def _bottleneck_down_int8_hwnc_kernel(x_ref, w1_ref, m1_ref, b1_ref,
                                      w2_ref, m2_ref, b2_ref, w3_ref,
                                      m3_ref, b3_ref, wd_ref, md_ref,
                                      bd_ref, out_ref, h1p_ref, *, bands):
    """Full-int8 stride-1 PROJECTION bottleneck (ResNet-50 layer1[0],
    reference resnet_cls.py Bottleneck-with-downsample) on the
    (H, W, B, C) view: _bottleneck_down_int8_kernel's requant math in
    the layout-native hwnc form (see _bottleneck_int8_hwnc_kernel).
    conv3 and the projection keep SEPARATE s32 dots — their requant
    multipliers m3/md differ per channel, so the v2 kernels' K-packed
    [h2|x] matmul does not apply to quantized arithmetic."""
    H, W, B, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    Cm = w1_ref.shape[1]
    rb = H // bands

    _zero_border(h1p_ref)
    for t in range(bands):
        y0 = t * rb
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin)
        acc = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.int32)
        h1p_ref[1 + y0:1 + y0 + rb, 1:W + 1, :, :] = _rq8(
            acc, m1_ref[:], b1_ref[:]).reshape(rb, W, B, Cm)

    w2f = w2_ref[:].reshape(9 * Cm, Cm)
    for t in range(bands):
        y0 = t * rb
        cols = jnp.concatenate(
            [h1p_ref[y0 + dy:y0 + dy + rb, dx:dx + W, :, :].reshape(
                rb * W * B, Cm)
             for dy in range(3) for dx in range(3)], axis=1)
        acc2 = jnp.dot(cols, w2f, preferred_element_type=jnp.int32)
        h2 = _rq8(acc2, m2_ref[:], b2_ref[:])
        acc3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
        y = acc3.astype(jnp.float32) * m3_ref[:] + b3_ref[:]
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin)
        accd = jnp.dot(xb, wd_ref[:], preferred_element_type=jnp.int32)
        iden = accd.astype(jnp.float32) * md_ref[:] + bd_ref[:]
        out_ref[y0:y0 + rb] = jnp.clip(
            jnp.round(y + iden), 0, 127
        ).astype(jnp.int8).reshape(rb, W, B, Cout)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget',
                                    'bands', 'band_budget'))
def fused_bottleneck_down_int8_hwnc(x, w1, m1, b1, w2, m2, b2, w3, m3, b3,
                                    wd, md, bd, interpret=False,
                                    batch_tile=None, bt_budget=None,
                                    bands=None, band_budget=None):
    """int8c stride-1 projection bottleneck on the (H, W, N, Cin) int8
    view -> int8 (H, W, N, Cout). Args per fused_bottleneck_down_int8;
    layout/VMEM story per fused_bottleneck_int8_hwnc."""
    H, W, N, Cin = x.shape
    Cm = w1.shape[1]
    Cout = w3.shape[1]
    if batch_tile is None:
        per_img = H * W * (Cin + Cout) * 2       # s8 in + s8 out, dbuf
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = min(32, max(8, (budget // max(per_img, 1)) // 8 * 8))
        while batch_tile > 0 and N % batch_tile:
            batch_tile -= 8
        if batch_tile <= 0:
            batch_tile = N
    B = batch_tile
    assert N % B == 0 and (B % 8 == 0 or B == N), (N, B)
    if bands is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        per_row = W * B * (9 * Cm + (Cin + 2 * Cout) * 4)
        rb = max(1, bb // max(per_row, 1))
        while H % rb:
            rb -= 1
        bands = H // rb
    assert H % bands == 0, (H, bands)

    return pl.pallas_call(
        functools.partial(_bottleneck_down_int8_hwnc_kernel, bands=bands),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=pl.BlockSpec((H, W, B, Cout), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, N, Cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, B, Cm), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, m1.astype(jnp.float32), b1.astype(jnp.float32),
      w2, m2.astype(jnp.float32), b2.astype(jnp.float32),
      w3, m3.astype(jnp.float32), b3.astype(jnp.float32),
      wd, md.astype(jnp.float32), bd.astype(jnp.float32))


def _bottleneck_down_s2_int8_hwnc_kernel(x_ref, w1_ref, m1_ref, b1_ref,
                                         w2_ref, m2_ref, b2_ref, w3_ref,
                                         m3_ref, b3_ref, wd_ref, md_ref,
                                         bd_ref, out_ref, pee_ref, peo_ref,
                                         poe_ref, poo_ref, *, bands_in,
                                         bands_out):
    """Full-int8 STRIDE-2 projection bottleneck on the (H, W, B, C)
    view: parity-plane conv2 per _bottleneck_down_s2_i8v2_hwnc_kernel
    (tap (dy, dx) -> plane (dy&1^1, dx&1^1) at offset ((dy+1)//2,
    (dx+1)//2)), requant math per _bottleneck_down_int8_kernel. The
    parity planes hold REQUANTIZED s8 h1, so conv2 stays a native
    s8 x s8 -> s32 MXU contraction."""
    H, W, B, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    Ho, Wo = H // 2, W // 2
    Cm = w1_ref.shape[1]
    rb = H // bands_in
    rbo = Ho // bands_out

    for p in (pee_ref, peo_ref, poe_ref, poo_ref):
        _zero_border_s2(p)
    for t in range(bands_in):
        y0 = t * rb
        xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin)
        acc = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.int32)
        h1 = _rq8(acc, m1_ref[:], b1_ref[:])
        h1 = h1.reshape(rb // 2, 2, Wo, 2, B, Cm)
        k0 = 1 + y0 // 2
        pee_ref[k0:k0 + rb // 2, 1:1 + Wo] = h1[:, 0, :, 0]
        peo_ref[k0:k0 + rb // 2, 1:1 + Wo] = h1[:, 0, :, 1]
        poe_ref[k0:k0 + rb // 2, 1:1 + Wo] = h1[:, 1, :, 0]
        poo_ref[k0:k0 + rb // 2, 1:1 + Wo] = h1[:, 1, :, 1]

    sel = {0: ('o', 0), 1: ('e', 1), 2: ('o', 1)}
    planes = {('e', 'e'): pee_ref, ('e', 'o'): peo_ref,
              ('o', 'e'): poe_ref, ('o', 'o'): poo_ref}
    w2f = w2_ref[:].reshape(9 * Cm, Cm)
    for t in range(bands_out):
        y0 = t * rbo
        taps = []
        for dy in range(3):
            rp, ro = sel[dy]
            for dx in range(3):
                cp, co = sel[dx]
                p = planes[(rp, cp)]
                taps.append(p[ro + y0:ro + y0 + rbo,
                              co:co + Wo].reshape(rbo * Wo * B, Cm))
        cols = jnp.concatenate(taps, axis=1)
        acc2 = jnp.dot(cols, w2f, preferred_element_type=jnp.int32)
        h2 = _rq8(acc2, m2_ref[:], b2_ref[:])
        acc3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
        y = acc3.astype(jnp.float32) * m3_ref[:] + b3_ref[:]
        xb = x_ref[2 * y0:2 * y0 + 2 * rbo].reshape(
            rbo, 2, Wo, 2, B, Cin)[:, 0, :, 0]
        xb = xb.reshape(rbo * Wo * B, Cin)
        accd = jnp.dot(xb, wd_ref[:], preferred_element_type=jnp.int32)
        iden = accd.astype(jnp.float32) * md_ref[:] + bd_ref[:]
        out_ref[y0:y0 + rbo] = jnp.clip(
            jnp.round(y + iden), 0, 127
        ).astype(jnp.int8).reshape(rbo, Wo, B, Cout)


@functools.partial(jax.jit,
                   static_argnames=('interpret', 'batch_tile', 'bt_budget',
                                    'bands_in', 'bands_out', 'band_budget'))
def fused_bottleneck_down_s2_int8_hwnc(x, w1, m1, b1, w2, m2, b2, w3, m3,
                                       b3, wd, md, bd, interpret=False,
                                       batch_tile=None, bt_budget=None,
                                       bands_in=None, bands_out=None,
                                       band_budget=None):
    """int8c stride-2 projection bottleneck on the (H, W, N, Cin) int8
    view -> int8 (H/2, W/2, N, Cout)."""
    H, W, N, Cin = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    Cm = w1.shape[1]
    Cout = w3.shape[1]
    Ho, Wo = H // 2, W // 2
    if batch_tile is None:
        per_img = (H * W * Cin + Ho * Wo * Cout) * 2    # s8, dbuffered
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = min(32, max(8, (budget // max(per_img, 1)) // 8 * 8))
        while batch_tile > 0 and N % batch_tile:
            batch_tile -= 8
        if batch_tile <= 0:
            batch_tile = N
    B = batch_tile
    assert N % B == 0 and (B % 8 == 0 or B == N), (N, B)
    if bands_in is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        per_row = W * B * (Cin + Cm * 4)        # xb s8 + h1 s32/f32
        rb = max(2, (bb // max(per_row, 1)) // 2 * 2)
        while H % rb or rb % 2:
            rb -= 2
        rb = max(rb, 2)
        bands_in = H // rb
    if bands_out is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        per_row = Wo * B * (9 * Cm + (Cin + 2 * Cout) * 4)
        rbo = max(1, bb // max(per_row, 1))
        while Ho % rbo:
            rbo -= 1
        bands_out = Ho // rbo
    assert H % bands_in == 0 and (H // bands_in) % 2 == 0, (H, bands_in)
    assert Ho % bands_out == 0, (Ho, bands_out)

    return pl.pallas_call(
        functools.partial(_bottleneck_down_s2_int8_hwnc_kernel,
                          bands_in=bands_in, bands_out=bands_out),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 12,
        out_specs=pl.BlockSpec((Ho, Wo, B, Cout), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ho, Wo, N, Cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((Ho + 1, Wo + 1, B, Cm), jnp.int8)
                        for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, w1, m1.astype(jnp.float32), b1.astype(jnp.float32),
      w2, m2.astype(jnp.float32), b2.astype(jnp.float32),
      w3, m3.astype(jnp.float32), b3.astype(jnp.float32),
      wd, md.astype(jnp.float32), bd.astype(jnp.float32))


def _bottleneck_i8v2_hwnc_stage_kernel(*refs, bands, nblocks, staging,
                                       down=False):
    """Run `nblocks` consecutive v2 identity bottlenecks on one (H, W,
    B, C) tile with the activation resident in VMEM across blocks — the
    inter-block HBM round trip of the per-block hwnc kernel (write +
    re-read of the full activation per boundary) disappears.

    refs layout: x_ref, [down (w1, b1, w2, b2, w3, b3, wd, bd) if
    down], then per identity block (w1, b1, w2, b2, w3, b3), then
    r_ref (nblocks, 1) SMEM, out_ref, [act_ref], h1p_ref.

    down=True prepends the stride-1 PROJECTION bottleneck (ResNet-50
    layer1[0]) — same body as _bottleneck_down_i8v2_hwnc_kernel, its
    quantized output written to act_ref instead of HBM, so ALL of
    layer1 is one pallas call (requires staging='act'; the projection
    changes C so 'out' staging can't hold the intermediate).

    Inter-block staging:
      'out' — stage through out_ref itself: inter-block values are
        quantized integers 0..127, exact in int8, so the out window
        doubles as the activation buffer. Cheapest VMEM (a dedicated
        bf16 scratch pushed scoped VMEM to 116.8M at layer1 > the
        ~104.5M ceiling) but pays s8<->bf16 sublane repacking per
        boundary on the VPU (measured: 4,306 pairs/s, LOSES to
        per-block hwnc's 4,480).
      'act' — a compute-dtype VMEM scratch holds the quantized values
        exactly (0..127 in bf16): no repacking at all. Costs
        H*W*B*Cin*2 extra scoped VMEM, so the wrapper only picks it
        where it fits (layers 2-4, and layer1 with s8 windows)."""
    assert not down or staging == 'act', 'projection prefix needs act'
    nd = 8 if down else 0
    x_ref = refs[0]
    r_ref = refs[1 + nd + 6 * nblocks]
    out_ref = refs[2 + nd + 6 * nblocks]
    act_ref = refs[3 + nd + 6 * nblocks] if staging == 'act' else None
    h1p_ref = refs[-1]
    H, W, B, _ = x_ref.shape
    rb = H // bands

    if down:
        (w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, wd_ref,
         bd_ref) = refs[1:9]
        Cin_d = x_ref.shape[-1]
        Cm = w1_ref.shape[1]
        cdt = w1_ref.dtype
        _zero_border(h1p_ref)
        for t in range(bands):
            y0 = t * rb
            xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin_d).astype(cdt)
            h1 = jnp.dot(xb, w1_ref[:],
                         preferred_element_type=jnp.float32)
            h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)
            h1p_ref[1 + y0:1 + y0 + rb, 1:W + 1, :, :] = h1.reshape(
                rb, W, B, Cm)
        # conv3 + the 1x1 projection as ONE K-packed matmul (see
        # _bottleneck_down_i8v2_hwnc_kernel)
        w3d = jnp.concatenate([w3_ref[:], wd_ref[:]], axis=0)
        Cout = w3_ref.shape[1]
        for t in range(bands):
            y0 = t * rb
            acc = _conv2_band(h1p_ref, w2_ref, y0, rb, 'im2col')
            h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(cdt)
            xb = x_ref[y0:y0 + rb].reshape(rb * W * B, Cin_d).astype(cdt)
            out = jnp.dot(jnp.concatenate([h2, xb], axis=1), w3d,
                          preferred_element_type=jnp.float32)
            out = out + b3_ref[:] + bd_ref[:]
            q = jnp.clip(jnp.round(out), 0.0, 127.0)
            act_ref[y0:y0 + rb] = q.astype(act_ref.dtype).reshape(
                rb, W, B, Cout)

    for k in range(nblocks):
        w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref = \
            refs[1 + nd + 6 * k:7 + nd + 6 * k]
        Cm = w1_ref.shape[1]
        cdt = w1_ref.dtype
        if staging == 'act':
            src = act_ref if (k == 0 and down) else (
                x_ref if k == 0 else act_ref)
            dst = out_ref if k == nblocks - 1 else act_ref
        else:
            src = x_ref if k == 0 else out_ref
            dst = out_ref
        Cin = src.shape[-1]

        # conv1 per band, relu'd into the padded scratch
        _zero_border(h1p_ref)
        for t in range(bands):
            y0 = t * rb
            xb = src[y0:y0 + rb].reshape(rb * W * B, Cin).astype(cdt)
            h1 = jnp.dot(xb, w1_ref[:],
                         preferred_element_type=jnp.float32)
            h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)
            h1p_ref[1 + y0:1 + y0 + rb, 1:W + 1, :, :] = h1.reshape(
                rb, W, B, Cm)

        # conv2 + conv3 + residual + requant per band; the band's
        # residual read happens before its write, so src == dst
        # (act -> act) is safe
        for t in range(bands):
            y0 = t * rb
            acc = _conv2_band(h1p_ref, w2_ref, y0, rb, 'im2col')
            h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(cdt)

            out = jnp.dot(h2, w3_ref[:],
                          preferred_element_type=jnp.float32)
            xb = src[y0:y0 + rb].reshape(rb * W * B, Cin)
            out = out + b3_ref[:] + xb.astype(jnp.float32) * r_ref[k, 0]
            q = jnp.clip(jnp.round(out), 0.0, 127.0)
            dst[y0:y0 + rb] = q.astype(dst.dtype).reshape(
                rb, W, B, Cin)


@functools.partial(jax.jit,
                   static_argnames=('nblocks', 'interpret', 'batch_tile',
                                    'bt_budget', 'out_int8', 'bands',
                                    'staging', 'down', 'band_budget'))
def fused_bottleneck_i8v2_hwnc_stage(x, *flat_wb, nblocks, interpret=False,
                                     batch_tile=None, bt_budget=None,
                                     out_int8=True, bands=None,
                                     staging='out', down=False,
                                     band_budget=None):
    """Stage-fused v2 identity run on the (H, W, N, Cin) view: `nblocks`
    consecutive identity bottlenecks per pallas call. flat_wb is
    [down (w1, b1, w2, b2, w3, b3, wd, bd) if down] then
    (w1, b1, w2, b2, w3, b3) per identity block, followed by rs
    (nblocks,) f32. down=True prepends the stride-1 projection block
    (layer1[0]) so the whole stage — projection + identity run — is one
    call: x is then the STEM output (H, W, N, Cin_stem) and the
    projection output (Cout) never touches HBM. See
    fused_bottleneck_i8v2_hwnc for the layout/VMEM story and the kernel
    docstring for the 'out'/'act' staging trade."""
    nd = 8 if down else 0
    assert len(flat_wb) == nd + 6 * nblocks + 1, len(flat_wb)
    assert not down or (staging == 'act' and nblocks >= 1)
    # one shared (H+2, W+2, B, Cm) conv2 scratch: projection and
    # identity blocks must agree on Cm (true across resnet50: every
    # block of a stage has the same mid width)
    assert all(flat_wb[i].shape[1] == flat_wb[0].shape[1]
               for i in range(nd, nd + 6 * nblocks, 6)), 'Cm mismatch'
    rs = flat_wb[-1]
    wbs = []
    if down:
        w1, b1, w2, b2, w3, b3, wd, bd = flat_wb[:8]
        wbs += [w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
                w3, b3.astype(jnp.float32), wd, bd.astype(jnp.float32)]
    for k in range(nblocks):
        w1, b1, w2, b2, w3, b3 = flat_wb[nd + 6 * k:nd + 6 * k + 6]
        wbs += [w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32),
                w3, b3.astype(jnp.float32)]
    H, W, N, Cin = x.shape
    Cm = flat_wb[0].shape[1]
    # the activation channel width the identity run sees (= projection
    # output width when down, else the input width)
    Cact = flat_wb[4].shape[1] if down else Cin
    cdt = flat_wb[0].dtype
    if batch_tile is None:
        per_img = H * W * (Cin + Cact) * 2 if down else H * W * Cin * 2 * 2
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = min(32, max(8, (budget // max(per_img, 1)) // 8 * 8))
        while batch_tile > 0 and N % batch_tile:
            batch_tile -= 8
        if batch_tile <= 0:
            batch_tile = N
    B = batch_tile
    assert N % B == 0 and (B % 8 == 0 or B == N), (N, B)
    if bands is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        per_row = W * B * (9 * Cm * 2 + Cact * 8)
        rb = max(1, bb // max(per_row, 1))
        while H % rb:
            rb -= 1
        bands = H // rb
    assert H % bands == 0, (H, bands)

    scratch = []
    if staging == 'act':
        scratch.append(pltpu.VMEM((H, W, B, Cact), cdt))
    scratch.append(pltpu.VMEM((H + 2, W + 2, B, Cm), cdt))
    return pl.pallas_call(
        functools.partial(_bottleneck_i8v2_hwnc_stage_kernel, bands=bands,
                          nblocks=nblocks, staging=staging, down=down),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((H, W, B, Cin), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nd + 6 * nblocks) + [
            pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((H, W, B, Cact), lambda i: (0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (H, W, N, Cact), jnp.int8 if out_int8 else cdt),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, *wbs, jnp.asarray(rs, jnp.float32).reshape(nblocks, 1))


def _zero_border_split(ref):
    """Zero only the 1-element padded border (rows 0/H+1, packed cols
    0/W2+1, both parity planes) of an (H+2, W2+2, 2, B, C) parity-split
    conv scratch."""
    h2, w2 = ref.shape[0], ref.shape[1]
    zr = jnp.zeros((1,) + ref.shape[1:], ref.dtype)
    ref[0:1] = zr
    ref[h2 - 1:h2] = zr
    zc = jnp.zeros((h2, 1) + ref.shape[2:], ref.dtype)
    ref[:, 0:1] = zc
    ref[:, w2 - 1:w2] = zc


def _bottleneck_i8v2_hwncp_stage_kernel(*refs, bands, nblocks, unroll=1):
    """Layer1 stage (stride-1 projection + identity run) on the PARITY-
    SPLIT (H, W/2, 2, B, C) view — a pure reshape (bitcast) of the hwnc
    layout, so entering/leaving costs nothing, but horizontally adjacent
    pixel PAIRS become lane-concatenable: the identity blocks' 3x3 conv2
    runs LANE-PACKED, two output pixels per matmul row with the 4-wide
    union tap window (K = 12*Cm, N = 2*Cm) — full 128-lane MXU width at
    Cm=64 where the unpacked conv2 (K=9*Cm, N=Cm) runs at half width,
    for 1.33x the MACs: a 1.5x conv2 speedup. conv1 stays unpacked (its
    rows (y, wp, s, b) store STRAIGHT into the split scratch) and conv3
    runs block-diagonal ((2Cm, 2Cout), 2x MACs at 2x width = time
    parity) so no sub-tile lane surgery exists anywhere — every access
    is a contiguous slice or a unit index on an untiled dim (the
    down_s2 parity-plane pattern).

    refs: x_ref (H, W2, 2, B, Cin), projection (w1, b1, w2f (9Cm, Cm),
    b2, w3d (Cm+Cin, Cout), b3d), then per identity block (w1, b1,
    w2pk (12Cm, 2Cm), b2pk, w3pk (2Cm, 2Cout), b3pk), r_ref
    (nblocks, 1) SMEM, out_ref, act_ref, h1p_ref (H+2, W2+2, 2, B, Cm).

    Tap algebra (output pixel (wp, s) reads original columns
    2wp+s-1 .. 2wp+s+1; padded packed-column index c' = wp'+1):
      unpacked (projection):  s=0 -> (s'=1, c'=wp), (0, wp+1), (1, wp+1)
                              s=1 -> (0, wp+1), (1, wp+1), (0, wp+2)
      packed pair (du 0..3):  du=0 -> (1, wp); du=1 -> (0, wp+1);
                              du=2 -> (1, wp+1); du=3 -> (0, wp+2)
      with w2pk[dy, du, c, s*Cm+co] = w2[dy, du-s, c, co] (0 outside).

    Band loops are `lax.fori_loop`s over dynamic `pl.ds` row slices, NOT
    Python-unrolled: the unrolled form emitted bands x (2 + 4*nblocks)
    slice/concat/matmul groups — a 47 MB MLIR payload at model scale
    that the remote TPU compile helper could not ingest
    (tools/artifacts/gate_r4_hwncp.log, min_hwncp.log)."""
    x_ref = refs[0]
    r_ref = refs[7 + 6 * nblocks]
    out_ref = refs[8 + 6 * nblocks]
    act_ref = refs[9 + 6 * nblocks]
    h1p_ref = refs[-1]
    H, W2, _, B, Cin_d = x_ref.shape
    rb = H // bands

    def conv2_slices(y0, packed):
        """Tap slices for one band: 12 (packed pairs) or 2x9 (unpacked,
        stacked on the parity dim) -> (rows, K) cols matrix."""
        Cm = h1p_ref.shape[-1]
        if packed:
            cols = []
            for dy in range(3):
                row = h1p_ref[pl.ds(y0 + dy, rb)]
                for cs, s in ((0, 1), (1, 0), (1, 1), (2, 0)):
                    cols.append(row[:, cs:cs + W2, s].reshape(
                        rb * W2 * B, Cm))
            return jnp.concatenate(cols, axis=1)       # (.., 12Cm)
        a_s = []
        for s in range(2):
            cols = []
            for dy in range(3):
                row = h1p_ref[pl.ds(y0 + dy, rb)]
                if s == 0:
                    sl = (row[:, 0:W2, 1], row[:, 1:W2 + 1, 0],
                          row[:, 1:W2 + 1, 1])
                else:
                    sl = (row[:, 1:W2 + 1, 0], row[:, 1:W2 + 1, 1],
                          row[:, 2:W2 + 2, 0])
                cols += [a.reshape(rb * W2 * B, Cm) for a in sl]
            a_s.append(jnp.concatenate(cols, axis=1).reshape(
                rb, W2, B, 9 * Cm))
        return jnp.stack(a_s, axis=2).reshape(rb * W2 * 2 * B, 9 * Cm)

    def bandloop(body):
        # partial unroll: `unroll` band bodies per fori_loop step —
        # recovers cross-band instruction overlap at code size
        # ~proportional to `unroll` instead of `bands`
        u = unroll
        assert bands % u == 0, (bands, u)

        def step(t, c):
            for j in range(u):
                body((t * u + j) * rb)
            return c
        jax.lax.fori_loop(0, bands // u, step, None)

    # ---- projection (layer1[0]): unpacked rows (y, wp, s, b) ----
    (w1_ref, b1_ref, w2f_ref, b2_ref, w3d_ref, b3d_ref) = refs[1:7]
    Cm = w1_ref.shape[1]
    cdt = w1_ref.dtype
    _zero_border_split(h1p_ref)

    def proj_h1(y0):
        xb = x_ref[pl.ds(y0, rb)].reshape(rb * W2 * 2 * B,
                                          Cin_d).astype(cdt)
        h1 = jnp.dot(xb, w1_ref[:], preferred_element_type=jnp.float32)
        h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)
        h1p_ref[pl.ds(1 + y0, rb), 1:W2 + 1] = h1.reshape(
            rb, W2, 2, B, Cm)
    bandloop(proj_h1)

    def proj_rest(y0):
        acc = jnp.dot(conv2_slices(y0, packed=False), w2f_ref[:],
                      preferred_element_type=jnp.float32)
        h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(cdt)
        xb = x_ref[pl.ds(y0, rb)].reshape(rb * W2 * 2 * B,
                                          Cin_d).astype(cdt)
        # conv3 + 1x1 projection as ONE K-packed matmul [h2 | x] @
        # [[w3], [wd]] (full 128-lane K already — packing would double
        # the MACs for nothing)
        out = jnp.dot(jnp.concatenate([h2, xb], axis=1), w3d_ref[:],
                      preferred_element_type=jnp.float32)
        out = out + b3d_ref[:]
        q = jnp.clip(jnp.round(out), 0.0, 127.0)
        act_ref[pl.ds(y0, rb)] = q.astype(act_ref.dtype).reshape(
            rb, W2, 2, B, -1)
    bandloop(proj_rest)

    # ---- identity run: lane-packed conv2/conv3 ----
    for k in range(nblocks):
        (w1_ref, b1_ref, w2pk_ref, b2pk_ref, w3pk_ref,
         b3pk_ref) = refs[7 + 6 * k:13 + 6 * k]
        Cm = w1_ref.shape[1]
        cdt = w1_ref.dtype
        src = act_ref
        dst = out_ref if k == nblocks - 1 else act_ref
        Cact = src.shape[-1]

        _zero_border_split(h1p_ref)

        def iden_h1(y0, src=src, w1_ref=w1_ref, b1_ref=b1_ref,
                    Cact=Cact, Cm=Cm, cdt=cdt):
            xb = src[pl.ds(y0, rb)].reshape(rb * W2 * 2 * B,
                                            Cact).astype(cdt)
            h1 = jnp.dot(xb, w1_ref[:],
                         preferred_element_type=jnp.float32)
            h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(cdt)
            h1p_ref[pl.ds(1 + y0, rb), 1:W2 + 1] = h1.reshape(
                rb, W2, 2, B, Cm)
        bandloop(iden_h1)

        # packed conv2/conv3/residual/requant per band; the band's
        # residual read happens before its write, so act -> act is safe
        def iden_rest(y0, k=k, src=src, dst=dst, w2pk_ref=w2pk_ref,
                      b2pk_ref=b2pk_ref, w3pk_ref=w3pk_ref,
                      b3pk_ref=b3pk_ref, Cact=Cact, cdt=cdt):
            acc = jnp.dot(conv2_slices(y0, packed=True), w2pk_ref[:],
                          preferred_element_type=jnp.float32)
            h2p = jnp.maximum(acc + b2pk_ref[:], 0.0).astype(cdt)
            outp = jnp.dot(h2p, w3pk_ref[:],
                           preferred_element_type=jnp.float32)
            xr = src[pl.ds(y0, rb)]
            xpair = jnp.concatenate([xr[:, :, 0], xr[:, :, 1]],
                                    axis=-1).reshape(rb * W2 * B,
                                                     2 * Cact)
            outp = (outp + b3pk_ref[:]
                    + xpair.astype(jnp.float32) * r_ref[k, 0])
            q = jnp.clip(jnp.round(outp), 0.0, 127.0).astype(dst.dtype)
            q = q.reshape(rb, W2, B, 2 * Cact)
            dst[pl.ds(y0, rb), :, 0] = q[..., :Cact]
            dst[pl.ds(y0, rb), :, 1] = q[..., Cact:]
        bandloop(iden_rest)


@functools.partial(jax.jit,
                   static_argnames=('nblocks', 'interpret', 'batch_tile',
                                    'bt_budget', 'out_int8', 'bands',
                                    'band_budget', 'unroll'))
def fused_bottleneck_i8v2_hwncp_stage(x, *flat_wb, nblocks,
                                      interpret=False, batch_tile=None,
                                      bt_budget=None, out_int8=True,
                                      bands=None, band_budget=None,
                                      unroll=1):
    """Parity-split lane-PACKED layer1 stage ('hwncp'): same contract
    and flat_wb layout as fused_bottleneck_i8v2_hwnc_stage(down=True,
    staging='act') — (w1, b1, w2, b2, w3, b3, wd, bd) projection then
    (w1, b1, w2, b2, w3, b3) per identity block then rs — but the
    identity 3x3 convs run two horizontally adjacent output pixels per
    matmul row (full MXU lane width at Cm=64; see the kernel
    docstring). NOT bit-identical to the unpacked kernels: the packed
    K=12Cm contraction reassociates the f32 accumulation (scatter-mode
    closeness bar, not the bit-exact one)."""
    assert len(flat_wb) == 8 + 6 * nblocks + 1, len(flat_wb)
    assert nblocks >= 1
    rs = flat_wb[-1]
    w1d, b1d, w2d, b2d, w3d_, b3d_, wdd, bdd = flat_wb[:8]
    Cm = w1d.shape[1]
    cdt = w1d.dtype
    wbs = [w1d, b1d.astype(jnp.float32), w2d.reshape(9 * Cm, Cm),
           b2d.astype(jnp.float32),
           jnp.concatenate([w3d_, wdd], axis=0),
           (b3d_.astype(jnp.float32) + bdd.astype(jnp.float32))]
    for k in range(nblocks):
        w1, b1, w2, b2, w3, b3 = flat_wb[8 + 6 * k:14 + 6 * k]
        assert w1.shape[1] == Cm, 'Cm mismatch'
        # w2pk[dy, du, c, s*Cm+co] = w2[dy, du-s, c, co] (0 outside)
        w2pk = jnp.stack(
            [jnp.pad(w2, ((0, 0), (0, 1), (0, 0), (0, 0))),
             jnp.pad(w2, ((0, 0), (1, 0), (0, 0), (0, 0)))],
            axis=-2).reshape(12 * Cm, 2 * w2.shape[-1])
        w3pk = jnp.kron(jnp.eye(2, dtype=w3.dtype), w3)
        wbs += [w1, b1.astype(jnp.float32), w2pk,
                jnp.tile(b2.astype(jnp.float32), 2), w3pk,
                jnp.tile(b3.astype(jnp.float32), 2)]
    H, W, N, Cin = x.shape
    assert W % 2 == 0, W
    W2 = W // 2
    Cact = flat_wb[4].shape[1]
    if batch_tile is None:
        per_img = H * W * (Cin + Cact) * 2
        budget = BT_BUDGET if bt_budget is None else bt_budget
        batch_tile = min(32, max(8, (budget // max(per_img, 1)) // 8 * 8))
        while batch_tile > 0 and N % batch_tile:
            batch_tile -= 8
        if batch_tile <= 0:
            batch_tile = N
    B = batch_tile
    assert N % B == 0 and (B % 8 == 0 or B == N), (N, B)
    if bands is None:
        bb = 6 * 1024 * 1024 if band_budget is None else band_budget
        per_row = W * B * (9 * Cm * 2 + Cact * 8)
        rb = max(1, bb // max(per_row, 1))
        while H % rb:
            rb -= 1
        bands = H // rb
    assert H % bands == 0, (H, bands)
    while bands % unroll:
        unroll -= 1

    out = pl.pallas_call(
        functools.partial(_bottleneck_i8v2_hwncp_stage_kernel,
                          bands=bands, nblocks=nblocks, unroll=unroll),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((H, W2, 2, B, Cin), lambda i: (0, 0, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 + 6 * nblocks) + [
            pl.BlockSpec((nblocks, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((H, W2, 2, B, Cact),
                               lambda i: (0, 0, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (H, W2, 2, N, Cact), jnp.int8 if out_int8 else cdt),
        scratch_shapes=[
            pltpu.VMEM((H, W2, 2, B, Cact), cdt),
            pltpu.VMEM((H + 2, W2 + 2, 2, B, Cm), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x.reshape(H, W2, 2, N, Cin), *wbs,
      jnp.asarray(rs, jnp.float32).reshape(nblocks, 1))
    return out.reshape(H, W, N, Cact)


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
    x int8 (B, H, W, Cin) -> out int8 (B, H, W, Cout). Matmuls run as
    native int8 x int8 -> int32 on the MXU."""
    B, H, W, Cin = x_ref.shape
    Cout = out_ref.shape[-1]
    Cm = w1_ref.shape[1]

    x2d = x_ref[:].reshape(B * H * W, Cin)
    acc = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.int32)
    h1 = _rq8(acc, m1_ref[:], b1_ref[:])

    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[:, 1:H + 1, 1:W + 1, :] = h1.reshape(B, H, W, Cm)

    cols = jnp.concatenate(
        [h1p_ref[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, Cm)
         for dy in range(3) for dx in range(3)], axis=1)
    acc2 = jnp.dot(cols, w2_ref[:].reshape(9 * Cm, Cm),
                   preferred_element_type=jnp.int32)
    h2 = _rq8(acc2, m2_ref[:], b2_ref[:])

    acc3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
    y = acc3.astype(jnp.float32) * m3_ref[:] + b3_ref[:]

    accd = jnp.dot(x2d, wd_ref[:], preferred_element_type=jnp.int32)
    iden = accd.astype(jnp.float32) * md_ref[:] + bd_ref[:]
    out_ref[:] = jnp.clip(jnp.round(y + iden), 0, 127
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

    x2d = xp_ref[:].reshape(4 * B * Ho * Wo, Cin)
    acc = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.int32)
    h1 = _rq8(acc, m1_ref[:], b1_ref[:])

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
                   w2_ref[:].reshape(9 * Cm, Cm),
                   preferred_element_type=jnp.int32)
    h2 = _rq8(acc2, m2_ref[:], b2_ref[:])

    acc3 = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.int32)
    y = acc3.astype(jnp.float32) * m3_ref[:] + b3_ref[:]

    xs = xp_ref[0, 0].reshape(B * Ho * Wo, Cin)
    accd = jnp.dot(xs, wd_ref[:], preferred_element_type=jnp.int32)
    iden = accd.astype(jnp.float32) * md_ref[:] + bd_ref[:]
    out_ref[:] = jnp.clip(jnp.round(y + iden), 0, 127
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
                pltpu.VMEM((B, H + 2, W + 2, Cm), jnp.int8)],
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
            pltpu.VMEM((2, 2, B, Ho + 1, Wo + 1, Cm), jnp.int8)],
        compiler_params=cp, interpret=interpret,
    )(xp, *args)


# ---------------------------------------------------------------------------
# Fused stem: conv 7x7/2 (pad 3) + bias + relu (+ requant) + maxpool 3x3/2
# (pad 1), VMEM-resident. The two stride-2 stages are handled with a mod-4
# space-to-depth packing: the padded input is reshaped to
# (N, 66, 66, 16*C) where lane (qy*4 + qx)*C + c holds x[4*ky+qy, 4*kx+qx, c]
# — every 7x7/2 tap becomes a unit-stride spatial slice contracted against a
# weight matrix with the taps embedded at the right lane rows, and the conv
# output is produced directly as 2x2 parity planes so the stride-2 maxpool
# is 9 unit-stride plane slices. No strided VMEM loads (Mosaic has none for
# non-32-bit data) and no 25x lane padding from the raw 5-channel input.
# Replaces the XLA stem whose 128^2 conv output materialises
# (N, 128, 128, 64) in HBM (8.4GB lane-padded at bench batch).
# ---------------------------------------------------------------------------

def _stem_pack(x):
    """(N, H, W, C) -> (N, H//4 + 2, W//4 + 2, 16*C) mod-4 packed, padded
    3 front / 5 back (conv pad 3, and 4-alignment slack)."""
    N, H, W, C = x.shape
    xpad = jnp.pad(x, ((0, 0), (3, 5), (3, 5), (0, 0)))
    Ky, Kx = (H + 8) // 4, (W + 8) // 4
    xp = xpad.reshape(N, Ky, 4, Kx, 4, C).transpose(0, 1, 3, 2, 4, 5)
    return xp.reshape(N, Ky, Kx, 16 * C)


def _stem_plane_weights(w):
    """(7, 7, C, Cout) -> (2, 2, 3, 3, 16*C, Cout): for conv-output parity
    plane (a, b) and spatial slice offset (k0y, k0x), the (16*C, Cout)
    matrix with w[dy, dx] embedded at lane rows (qy*4 + qx)*C + c where
    dy = 4*k0y + qy - 2*a (zero where dy falls outside [0, 7))."""
    import numpy as _np
    C, Cout = w.shape[2], w.shape[3]
    a = _np.arange(2)[:, None, None]
    k0 = _np.arange(3)[None, :, None]
    q = _np.arange(4)[None, None, :]
    d = 4 * k0 + q - 2 * a                    # (2, 3, 4)
    valid = (d >= 0) & (d < 7)
    dc = _np.clip(d, 0, 6)
    wq = jnp.asarray(w)[dc[:, :, :, None, None, None],
                        dc[None, None, None]]
    # (2,3,4, 2,3,4, C, Cout) indexed (a,k0y,qy, b,k0x,qx, c, o)
    mask = valid[:, :, :, None, None, None] & valid[None, None, None]
    wq = jnp.where(jnp.asarray(mask)[..., None, None], wq,
                   jnp.zeros((), wq.dtype))
    wq = wq.transpose(0, 3, 1, 4, 2, 5, 6, 7)  # (a,b,k0y,k0x,qy,qx,C,Cout)
    return wq.reshape(2, 2, 3, 3, 16 * C, Cout)


def _stem_v2_kernel(xp_ref, w_ref, b_ref, out_ref, hp_ref, *, q8=False):
    """xp (B, Ky, Kx, 16C) packed input; w (2,2,3,3,16C,Cout); out
    (B, Ho, Wo, Cout) pooled stem output; hp scratch (2,2,B,Ho+1,Wo+1,
    Cout) conv-output parity planes (front pad 1 for the pool). q8:
    quantize the pooled output to one-sided int8 in-kernel (the v2
    boundary _q8; pool of relu'd values is >= 0 so the clip's lower
    bound is never active)."""
    B, Ky, Kx, CL = xp_ref.shape
    _, _, _, Hp, Wp, Cout = hp_ref.shape
    Ho, Wo = Hp - 1, Wp - 1

    hp_ref[:] = jnp.zeros_like(hp_ref)
    for a in range(2):
        for b in range(2):
            acc = None
            for k0y in range(3):
                for k0x in range(3):
                    X = xp_ref[:, k0y:k0y + Ho, k0x:k0x + Wo, :].reshape(
                        B * Ho * Wo, CL)
                    p = jnp.dot(X, w_ref[a, b, k0y, k0x],
                                preferred_element_type=jnp.float32)
                    acc = p if acc is None else acc + p
            h = jnp.maximum(acc + b_ref[:], 0.0).astype(xp_ref.dtype)
            hp_ref[a, b, :, 1:, 1:, :] = h.reshape(B, Ho, Wo, Cout)

    pooled = None
    for dy in range(3):
        a, sy = _S2_PLANE[dy]
        for dx in range(3):
            b, sx = _S2_PLANE[dx]
            win = hp_ref[a, b, :, sy:sy + Ho, sx:sx + Wo, :]
            pooled = win if pooled is None else jnp.maximum(pooled, win)
    if q8:
        out_ref[:] = jnp.clip(jnp.round(pooled.astype(jnp.float32)),
                              0, 127).astype(jnp.int8)
    else:
        out_ref[:] = pooled


@functools.partial(jax.jit, static_argnames=('interpret', 'batch_tile',
                                             'q8'))
def fused_stem(x, w, b, interpret=False, batch_tile=None, q8=False):
    """x: (N, H, W, C); w: (7, 7, C, Cout) HWIO; b: (Cout,).
    Returns (N, H//4, W//4, Cout) — conv1 + relu + maxpool with the
    128^2-resolution conv output never touching HBM
    (reference resnet_cls.py:147-151 stem)."""
    N, H, W, C = x.shape
    Cout = w.shape[-1]
    assert H % 4 == 0 and W % 4 == 0
    Ho, Wo = H // 4, W // 4
    if batch_tile is None:
        it = x.dtype.itemsize
        # conservative: Mosaic's stack accounting also counts the
        # per-matmul value copies (X casts, f32 acc), ~2x the resident set
        per_img = (2 * (Ho + 2) * (Wo + 2) * 16 * C * it +
                   4 * (Ho + 1) * (Wo + 1) * max(Cout, 128) * it +
                   2 * Ho * Wo * max(Cout, 128) * it +
                   Ho * Wo * max(Cout, 128) * 4 +
                   Ho * Wo * (2 * 16 * C + 2 * max(Cout, 128)))
        budget = 40 * 1024 * 1024
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    xp = _stem_pack(x)
    wp = _stem_plane_weights(w)
    return pl.pallas_call(
        functools.partial(_stem_v2_kernel, q8=q8),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, Ho + 2, Wo + 2, 16 * C),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, Ho, Wo, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (N, Ho, Wo, Cout), jnp.int8 if q8 else x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 2, B, Ho + 1, Wo + 1, Cout), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wp.astype(x.dtype), b.astype(jnp.float32))


def _stem_v2_int8_kernel(xp_ref, w_ref, m_ref, b_ref, out_ref, hp_ref):
    """Quantized fused stem: int8 packed input/weights, requant epilogue
    (models/quantize.py), int8 maxpool output."""
    B, Ky, Kx, CL = xp_ref.shape
    _, _, _, Hp, Wp, Cout = hp_ref.shape
    Ho, Wo = Hp - 1, Wp - 1

    hp_ref[:] = jnp.zeros_like(hp_ref)
    for a in range(2):
        for b in range(2):
            acc = None
            for k0y in range(3):
                for k0x in range(3):
                    X = xp_ref[:, k0y:k0y + Ho, k0x:k0x + Wo, :].reshape(
                        B * Ho * Wo, CL)
                    p = jnp.dot(X, w_ref[a, b, k0y, k0x],
                                preferred_element_type=jnp.int32)
                    acc = p if acc is None else acc + p
            h = _rq8(acc, m_ref[:], b_ref[:])
            hp_ref[a, b, :, 1:, 1:, :] = h.reshape(B, Ho, Wo, Cout)

    pooled = None
    for dy in range(3):
        a, sy = _S2_PLANE[dy]
        for dx in range(3):
            b, sx = _S2_PLANE[dx]
            # pool in i32: Mosaic has no i8 vector max (arith.maxsi on
            # vector<...xi8> fails to legalize on hardware; found live)
            win = hp_ref[a, b, :, sy:sy + Ho, sx:sx + Wo, :].astype(
                jnp.int32)
            pooled = win if pooled is None else jnp.maximum(pooled, win)
    out_ref[:] = pooled.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=('interpret', 'batch_tile'))
def fused_stem_int8(x8, w8, m, b, interpret=False, batch_tile=None):
    """x8: (N, H, W, C) int8; w8: (7, 7, C, Cout) int8; m/b: (Cout,) f32
    folded requant scale/bias (models/quantize.py conv1 epilogue).
    Returns int8 (N, H//4, W//4, Cout)."""
    N, H, W, C = x8.shape
    Cout = w8.shape[-1]
    assert H % 4 == 0 and W % 4 == 0
    Ho, Wo = H // 4, W // 4
    if batch_tile is None:
        per_img = (2 * (Ho + 2) * (Wo + 2) * 16 * C +
                   4 * (Ho + 1) * (Wo + 1) * max(Cout, 128) * 2 +
                   2 * Ho * Wo * max(Cout, 128) +
                   Ho * Wo * max(Cout, 128) * 4 +
                   Ho * Wo * (2 * 16 * C + 2 * max(Cout, 128)))
        budget = 40 * 1024 * 1024
        batch_tile = max(1, min(8, budget // max(per_img, 1)))
        while N % batch_tile:
            batch_tile -= 1
    B = batch_tile
    assert N % B == 0, (N, B)

    xp = _stem_pack(x8)
    wp = _stem_plane_weights(w8)
    return pl.pallas_call(
        _stem_v2_int8_kernel,
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, Ho + 2, Wo + 2, 16 * C),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, Ho, Wo, Cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, Cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, 2, B, Ho + 1, Wo + 1, Cout), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wp, m.astype(jnp.float32), b.astype(jnp.float32))


# ---------------------------------------------------------------------------
# Layout-native ("hwnc") identity bottleneck. XLA lowers its convs with
# layout {3,0,2,1} on logical (N, H, W, C) — byte-identical to row-major
# on logical (H, W, N, C). The standard kernels demand row-major NHWC, so
# XLA inserts a full-tensor relayout copy at every XLA<->pallas boundary
# (~10ms per (1080, 64, 64, 256) crossing, device trace). This variant
# takes the logically-transposed (H, W, N, C) view — the transpose is a
# layout bitcast, not a copy — and indexes spatial shifts on the two
# MAJOR dims, so no relayout is ever needed.
# ---------------------------------------------------------------------------

def _bottleneck_hwnc_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                            b3_ref, out_ref, h1p_ref):
    """One image per grid step on the (H, W, C) view: x (H, W, Cin) ->
    out same (a lane-merged slice of the (H, W, N*Cin) array — pallas
    demands the block's last two dims be (8, 128)-divisible, which rules
    out a small N tile as the second-minor dim)."""
    H, W, Cin = x_ref.shape
    Cm = w1_ref.shape[1]

    x2d = x_ref[:].reshape(H * W, Cin)
    h1 = jnp.dot(x2d, w1_ref[:], preferred_element_type=jnp.float32)
    h1 = jnp.maximum(h1 + b1_ref[:], 0.0).astype(x2d.dtype)

    h1p_ref[:] = jnp.zeros_like(h1p_ref)
    h1p_ref[1:H + 1, 1:W + 1] = h1.reshape(H, W, Cm)

    cols = jnp.concatenate(
        [h1p_ref[dy:dy + H, dx:dx + W].reshape(H * W, Cm)
         for dy in range(3) for dx in range(3)], axis=1)
    acc = jnp.dot(cols, w2_ref[:].reshape(9 * Cm, Cm),
                  preferred_element_type=jnp.float32)
    h2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(x2d.dtype)

    out = jnp.dot(h2, w3_ref[:], preferred_element_type=jnp.float32)
    out = out + b3_ref[:] + x2d.astype(jnp.float32)
    out_ref[:] = jnp.maximum(out, 0.0).astype(x2d.dtype).reshape(
        H, W, Cin)


@functools.partial(jax.jit, static_argnames=('interpret',))
def fused_bottleneck_hwnc(x, w1, b1, w2, b2, w3, b3, interpret=False):
    """Identity bottleneck on an (H, W, N, Cin) view (= XLA's preferred
    conv layout of NHWC, so entering/leaving the kernel is copy-free).
    The (N, Cin) dims are lane-merged and the grid runs one image per
    step."""
    H, W, N, Cin = x.shape
    Cm = w1.shape[1]
    xm = x.reshape(H, W, N * Cin)

    out = pl.pallas_call(
        _bottleneck_hwnc_kernel,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((H, W, Cin), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((H, W, Cin), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W, N * Cin), x.dtype),
        scratch_shapes=[pltpu.VMEM((H + 2, W + 2, Cm), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xm, w1, b1.astype(jnp.float32), w2, b2.astype(jnp.float32), w3,
      b3.astype(jnp.float32))
    return out.reshape(H, W, N, Cin)
