"""Fused per-pair crop+resize RGB prep as ONE pallas kernel.

Replaces the two-einsum RGB path of ops/pairs.build_pair_batch_matmul
(itself the MXU rewrite of the reference's per-pair host cv2 loop,
/root/reference/inference.py:366-375). The einsum path materialises a
(P, H, out, 3) f32 row-interp intermediate in HBM (~800 MB/step at
serving batch — trace_r4_hwncs1d.txt fusion.42) and contracts dense
interpolation matrices (K = full image width/height) even though each
output column has only 4 cubic taps. This kernel:

  * keeps the per-pair interp intermediate in VMEM (no HBM round trip);
  * builds the interpolation matrices IN-kernel from the roi scalars
    (VPU iota math — the same direct-grid formulas as
    pairs._interp_matrix, so semantics match cv2: zero outside the
    image, replicate-clamped taps inside the crop);
  * contracts only a per-pair WINDOW of the source axes: the 4-tap
    band of a 128-output half-block spans <= (half-1)*size/out + 5
    source columns, so K shrinks from the full 640/480 to a static
    window sized for the worst-case roi (~40%+ fewer MXU FLOPs);
  * runs the f32 matmuls as an explicit bf16 hi/lo 3-pass (the XLA
    Precision.HIGH decomposition) with f32 accumulation, so pixels
    match the einsum path's serving precision (<= 1 uint8 LSB, rare).

Layout: output is (S*P, 3, out, out) — channel-major so the kernel
writes full (out, out) lane tiles; the caller transposes to NHWC (the
same class of relayout XLA already inserts ahead of the stem conv).

Images enter as (S, 3, W, H): W on sublanes so the per-pair column
window is a dynamic SUBLANE slice (lane slices need relayout shifts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resize import _cubic_kernel

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _ceil8(v):
    return -(-int(v) // 8) * 8


def _fiota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32)


def _window_k(out_half, out_size, src_size, sz_max):
    """Static source-window length covering every 4-tap band a
    half-block of `out_half` outputs can touch for roi sizes up to
    sz_max, plus the crop-border clamp columns (c == 0 / c == chigh,
    shown in-window by the start formula in _half_window) and 8-align
    slack for the sublane-aligned dynamic start."""
    span = int(np.ceil((out_half - 1) * sz_max / out_size)) + 5
    return min(_ceil8(span + 15), _ceil8(src_size))


def _half_window(o0, out_size, off, size, src_size, kwin):
    """8-aligned window start (int32 scalar) for outputs [o0, o0+half):
    clip(floor(f(o0)) - 1 + off, 0, src - kwin) aligned down. Covers
    the half's tap band and both clamp columns for any roi with
    span(size) <= kwin (see _window_k)."""
    f0 = (o0 + 0.5) * size / out_size - 0.5
    k0 = jnp.floor(f0) - 1.0 + off
    k0 = jnp.clip(k0, 0.0, float(src_size - kwin))
    return (k0.astype(jnp.int32) // 8) * 8


def _half_window_nearest(o0, out_size, off, size, src_size, kwin):
    """Window start for the NEAREST taps of outputs [o0, o0+half):
    idx(j) = clip(floor(j*size/out), 0, size-1) + off (pairs.
    _nearest_taps), whose minimum over the half is floor(o0*size/out)
    + off — up to 2 BELOW the cubic start formula, so the mask path
    gets its own. Same kwin bound: align-down costs <= 7 and
    (half-1)*size/out + 8 < kwin by _window_k's +15 slack."""
    k0 = jnp.floor(float(o0) * size / out_size) + off
    k0 = jnp.clip(k0, 0.0, float(src_size - kwin))
    return (k0.astype(jnp.int32) // 8) * 8


def _half_matrix_nearest(o0, nout, k0, kwin, off, size, out_size,
                         src_size):
    """(nout, kwin) ONE-HOT nearest matrix for outputs [o0, o0+nout)
    over source columns [k0, k0+kwin) — pairs._interp_matrix 'nearest'
    restricted to the window (same float expressions: entries are the
    dense matrix's, so a bf16 matmul over {0,1} masks is exact)."""
    j = _fiota((nout, kwin), 0) + float(o0)
    t = jnp.clip(jnp.floor(j * size / out_size), 0.0, size - 1.0)
    src = t + off                                     # source coords
    valid = (src >= 0.0) & (src <= src_size - 1.0)
    # pairs._nearest_taps int32-casts AFTER the clip: a fractional
    # roi_size makes the size-1 clamp non-integer (e.g. 32.7) and the
    # cast truncates — floor matches (src >= 0 post-clip)
    src = jnp.floor(jnp.clip(src, 0.0, src_size - 1.0))
    kk = _fiota((nout, kwin), 1) + k0.astype(jnp.float32)
    return ((kk == src) & valid).astype(jnp.float32)


def _half_matrix(o0, nout, k0, kwin, off, size, out_size):
    """(nout, kwin) cubic interp matrix for outputs [o0, o0+nout) over
    source columns [k0, k0+kwin) — the pairs._interp_matrix direct-grid
    math restricted to the window (same float expressions, so entries
    are bit-identical to the dense matrix)."""
    # Mosaic's tpu.iota is integer-only — iota in i32, cast to f32
    j = _fiota((nout, kwin), 0) + float(o0)
    cidx = _fiota((nout, kwin), 1) + k0.astype(jnp.float32)
    c = cidx - off                                   # crop coords
    f = (j + 0.5) * size / out_size - 0.5
    x0 = jnp.floor(f)
    frac = f - x0
    m = _cubic_kernel((c - x0) - frac, xp=jnp)
    inwin = (c >= 0.0) & (c <= size - 1.0)
    m = m * inwin
    # clamp-accumulated tap mass at the crop borders (taps outside the
    # window replicate to c=0 / c=chigh in cv2's BORDER mode)
    jv = _fiota((nout, 4), 0) + float(o0)
    fv = (jv + 0.5) * size / out_size - 0.5
    x0v = jnp.floor(fv)
    ks = _fiota((nout, 4), 1) - 1.0
    w4 = _cubic_kernel(ks - (fv - x0v), xp=jnp)
    tap = x0v + ks
    low = jnp.sum(w4 * (tap < 0.0), axis=1)
    chigh = jnp.floor(size - 1.0)
    high = jnp.sum(w4 * (tap > size - 1.0), axis=1)
    return (m + low[:, None] * (c == 0.0)
            + high[:, None] * (c == chigh))


def _hl(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b, dn, passes):
    """f32 x f32 contraction as the bf16 hi/lo 3-pass (Precision.HIGH:
    ah.bh + ah.bl + al.bh, f32 accumulation) or 1-pass bf16 (the
    --prep-precision 'default' serving knob)."""
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                          preferred_element_type=jnp.float32)
    if passes == 1:
        return d(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    ah, al = _hl(a)
    bh, bl = _hl(b)
    return d(ah, bh) + d(ah, bl) + d(al, bh)


def _prep_rgb_kernel(roi_ref, x_ref, out_ref, s1_ref, *, P, out_size,
                     kw, kh, W, H, normalize, passes):
    s = pl.program_id(0)
    p = pl.program_id(1)
    i = s * P + p
    ox = roi_ref[i, 0]
    oy = roi_ref[i, 1]
    szx = roi_ref[i, 2]
    szy = roi_ref[i, 3]
    half = out_size // 2

    # stage 1: contract source columns (x axis). A window of the
    # (W, H) channel plane x the (half, kw) matrix -> (H, half).
    dn1 = (((0,), (1,)), ((), ()))
    for jo in range(2):
        o0 = jo * half
        k0 = _half_window(o0, out_size, ox, szx, W, kw)
        wx = _half_matrix(o0, half, k0, kw, ox, szx, out_size)
        for c in range(3):
            a = x_ref[0, c, pl.ds(k0, kw), :].astype(jnp.float32)
            s1_ref[c, :, o0:o0 + half] = _dot3(a, wx, dn1, passes)

    # stage 2: contract source rows (y axis). (half, kh) matrix x a
    # (kh, out) window of the stage-1 scratch -> (half, out).
    dn2 = (((1,), (0,)), ((), ()))
    for io in range(2):
        o0 = io * half
        k0 = _half_window(o0, out_size, oy, szy, H, kh)
        wy = _half_matrix(o0, half, k0, kh, oy, szy, out_size)
        for c in range(3):
            s1w = s1_ref[c, pl.ds(k0, kh), :]
            acc = _dot3(wy, s1w, dn2, passes)
            # cv2 resizes uint8 (saturate + round) before the float
            # conversion — emulate, then normalize (pairs.py epilogue)
            val = jnp.clip(jnp.round(acc), 0.0, 255.0)
            if normalize:
                val = (val / 255.0 - _MEAN[c]) / _STD[c]
            out_ref[0, c, o0:o0 + half, :] = val.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('out_size', 'normalize', 'out_dtype',
                                    'passes', 'interpret'))
def fused_prep_rgb(images, rois, out_size=256, normalize=True,
                   out_dtype=jnp.bfloat16, passes=3, interpret=False):
    """images (S, H, W, 3) f32 raw [0, 255]; rois (S, P, 4) float xywh
    (pair_rois output — integer-truncated offsets). Returns
    (S*P, 3, out, out) out_dtype, channel-major (transpose to NHWC at
    the caller). passes=3 is serving precision (== einsum HIGH path up
    to rare 1-LSB rounding ties); passes=1 is the 1-pass bf16 knob.

    Precondition: roi sizes <= max(sqrt(2*H*W), 1.1*max(H, W)) — the
    pair_rois bound for in-image bboxes; the static windows are sized
    for it (test-enforced incl. the worst-case geometry). H and W must
    be multiples of 8: the 8-aligned window starts assume
    src_size - kwin >= 0 with kwin itself 8-rounded — a 427-wide COCO
    image would clamp to a negative start and read out of bounds. Pad
    the source (callers bucket to 8-multiples) before using this path."""
    S, H, W, _ = images.shape
    if H % 8 or W % 8:
        raise ValueError(
            f'fused_prep_rgb needs 8-multiple image dims, got {H}x{W}; '
            f'pad the source or use the einsum path')
    P = rois.shape[1]
    half = out_size // 2
    sz_max = max(float(np.sqrt(2.0 * H * W)), 1.1 * max(H, W))
    kw = _window_k(half, out_size, W, sz_max)
    kh = _window_k(half, out_size, H, sz_max)

    img_t = jnp.transpose(images.astype(jnp.float32), (0, 3, 2, 1))
    roi_flat = rois.reshape(S * P, 4).astype(jnp.float32)

    kernel = functools.partial(
        _prep_rgb_kernel, P=P, out_size=out_size, kw=kw, kh=kh, W=W,
        H=H, normalize=normalize, passes=passes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, P),
        in_specs=[pl.BlockSpec((1, 3, W, H), lambda s, p, *_: (s, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, 3, out_size, out_size),
                               lambda s, p, *_: (s * P + p, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((3, H, out_size), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S * P, 3, out_size, out_size),
                                       out_dtype),
        interpret=interpret,
    )(roi_flat, img_t)


def _prep5_kernel(roi_ref, pidx_ref, x_ref, m_ref, out_ref, s1_ref,
                  s1m_ref, *, P, out_size, kw, kh, W, H, normalize,
                  passes):
    """All 5 pair channels in one kernel: out channels (mask_i, mask_j,
    r, g, b). RGB identical to _prep_rgb_kernel; masks are windowed
    one-hot nearest matmuls (exact over {0, 1}), reading the pair's two
    instance masks by a dynamic index on the untiled N axis."""
    s = pl.program_id(0)
    p = pl.program_id(1)
    i = s * P + p
    ox = roi_ref[i, 0]
    oy = roi_ref[i, 1]
    szx = roi_ref[i, 2]
    szy = roi_ref[i, 3]
    half = out_size // 2

    # ---- masks: stage 1 (x axis), one-hot nearest, 1-pass bf16 ----
    dn1 = (((0,), (1,)), ((), ()))
    for m in range(2):
        mi = pidx_ref[p, m]
        for jo in range(2):
            o0 = jo * half
            k0 = _half_window_nearest(o0, out_size, ox, szx, W, kw)
            wxn = _half_matrix_nearest(o0, half, k0, kw, ox, szx,
                                       out_size, W)
            a = m_ref[0, mi, pl.ds(k0, kw), :].astype(jnp.bfloat16)
            s1m_ref[m, :, o0:o0 + half] = jax.lax.dot_general(
                a, wxn.astype(jnp.bfloat16), dimension_numbers=dn1,
                preferred_element_type=jnp.float32).astype(s1m_ref.dtype)

    # ---- RGB stage 1 (same as _prep_rgb_kernel) ----
    for jo in range(2):
        o0 = jo * half
        k0 = _half_window(o0, out_size, ox, szx, W, kw)
        wx = _half_matrix(o0, half, k0, kw, ox, szx, out_size)
        for c in range(3):
            a = x_ref[0, c, pl.ds(k0, kw), :].astype(jnp.float32)
            s1_ref[c, :, o0:o0 + half] = _dot3(a, wx, dn1, passes)

    # ---- stage 2 (y axis) ----
    dn2 = (((1,), (0,)), ((), ()))
    for io in range(2):
        o0 = io * half
        k0n = _half_window_nearest(o0, out_size, oy, szy, H, kh)
        wyn = _half_matrix_nearest(o0, half, k0n, kh, oy, szy,
                                   out_size, H).astype(jnp.bfloat16)
        for m in range(2):
            s1w = s1m_ref[m, pl.ds(k0n, kh), :].astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                wyn, s1w, dimension_numbers=dn2,
                preferred_element_type=jnp.float32)
            out_ref[0, m, o0:o0 + half, :] = acc.astype(out_ref.dtype)
        k0 = _half_window(o0, out_size, oy, szy, H, kh)
        wy = _half_matrix(o0, half, k0, kh, oy, szy, out_size)
        for c in range(3):
            s1w = s1_ref[c, pl.ds(k0, kh), :]
            acc = _dot3(wy, s1w, dn2, passes)
            val = jnp.clip(jnp.round(acc), 0.0, 255.0)
            if normalize:
                val = (val / 255.0 - _MEAN[c]) / _STD[c]
            out_ref[0, 2 + c, o0:o0 + half, :] = val.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=('out_size', 'normalize', 'out_dtype',
                                    'passes', 'interpret'))
def fused_prep_pairs(images, masks, pair_idx, rois, out_size=256,
                     normalize=True, out_dtype=jnp.bfloat16, passes=3,
                     interpret=False):
    """Full 5-channel pair prep as ONE pallas kernel. images
    (S, H, W, 3) f32 raw; masks (S, N, H, W) {0,1}; pair_idx (P, 2)
    int32; rois (S, P, 4) float xywh. Returns (S*P, 5, out, out)
    out_dtype, channel-major (mask_i, mask_j, r, g, b) — transpose to
    NHWC at the caller.

    vs fused_prep_rgb + the einsum mask path this also keeps the mask
    resampling in VMEM: the einsum path's per-pair gather writes a
    (P, 2, H, W) s8 tensor (~1 GB/step at serving batch) plus a
    (P, 2, H, out) m1 intermediate through HBM; here each scene's N
    masks enter VMEM once (s8, (1, N, W, H) block) and the pair's two
    rows are read by dynamic index. Same roi-size and 8-multiple-dims
    preconditions as fused_prep_rgb; nearest windows use their own
    start formula (_half_window_nearest)."""
    S, H, W, _ = images.shape
    if H % 8 or W % 8:
        raise ValueError(
            f'fused_prep_pairs needs 8-multiple image dims, got {H}x{W}; '
            f'pad the source or use the einsum path')
    P = rois.shape[1]
    half = out_size // 2
    sz_max = max(float(np.sqrt(2.0 * H * W)), 1.1 * max(H, W))
    kw = _window_k(half, out_size, W, sz_max)
    kh = _window_k(half, out_size, H, sz_max)

    img_t = jnp.transpose(images.astype(jnp.float32), (0, 3, 2, 1))
    msk_t = jnp.transpose(masks.astype(jnp.int8), (0, 1, 3, 2))
    N = msk_t.shape[1]
    roi_flat = rois.reshape(S * P, 4).astype(jnp.float32)

    kernel = functools.partial(
        _prep5_kernel, P=P, out_size=out_size, kw=kw, kh=kh, W=W, H=H,
        normalize=normalize, passes=passes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S, P),
        in_specs=[
            pl.BlockSpec((1, 3, W, H), lambda s, p, *_: (s, 0, 0, 0)),
            pl.BlockSpec((1, N, W, H), lambda s, p, *_: (s, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 5, out_size, out_size),
                               lambda s, p, *_: (s * P + p, 0, 0, 0)),
        scratch_shapes=[pltpu.VMEM((3, H, out_size), jnp.float32),
                        pltpu.VMEM((2, H, out_size), jnp.bfloat16)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S * P, 5, out_size, out_size),
                                       out_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(roi_flat, jnp.asarray(pair_idx, jnp.int32), img_t, msk_t)
