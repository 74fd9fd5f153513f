"""On-device image resize with OpenCV index semantics.

The reference preprocesses every sample with `cv2.resize` on the host
(occ_order_dataset.py:84-96,153-170, inference.py:360-408). Here resize is
a *device* op designed for the MXU: linear/cubic interpolation over a fixed
(src -> dst) size pair is a separable linear map, so we materialise the row
and column interpolation matrices once per (static) shape and lower the
whole resize to two matmuls — which XLA fuses and tiles onto the systolic
array, and which batches trivially over pairs/channels.

Index conventions (matching OpenCV):
  INTER_NEAREST: src = floor(dst * src_size / dst_size)            (asymmetric)
  INTER_LINEAR / INTER_CUBIC: src = (dst + 0.5) * scale - 0.5      (half-pixel)
  out-of-range taps are clamped to the edge (BORDER_REPLICATE).
  INTER_CUBIC uses the Catmull-Rom-family kernel with A = -0.75.

cv2's uint8 path rounds in fixed point (2^11 coefficients); we compute in
float32, so uint8 outputs can differ by at most 1 LSB — the float path
(what the model actually consumes after /255 normalisation) matches to
float32 precision. See tests/test_resize.py for the parity harness.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp


def nearest_indices(src: int, dst: int) -> np.ndarray:
    """cv2.INTER_NEAREST source index for each dst position (static)."""
    idx = np.floor(np.arange(dst) * (src / dst)).astype(np.int32)
    return np.minimum(idx, src - 1)


@functools.lru_cache(maxsize=256)
def resize_weights_linear(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix W with out = W @ in, cv2.INTER_LINEAR semantics."""
    scale = src / dst
    fx = (np.arange(dst) + 0.5) * scale - 0.5
    x0 = np.floor(fx).astype(np.int64)
    t = fx - x0
    W = np.zeros((dst, src), dtype=np.float32)
    for tap, wgt in ((x0, 1.0 - t), (x0 + 1, t)):
        tap = np.clip(tap, 0, src - 1)
        np.add.at(W, (np.arange(dst), tap), wgt.astype(np.float32))
    return W


def _cubic_kernel(t, A: float = -0.75, xp=np):
    """OpenCV's bicubic kernel (BiCubic with A=-0.75), |t| in [0, 2).
    Pass xp=jnp for use inside traced code."""
    at = xp.abs(t)
    w = xp.where(
        at <= 1.0,
        ((A + 2.0) * at - (A + 3.0)) * at * at + 1.0,
        xp.where(at < 2.0, ((A * at - 5.0 * A) * at + 8.0 * A) * at - 4.0 * A,
                 0.0),
    )
    return w


@functools.lru_cache(maxsize=256)
def resize_weights_cubic(src: int, dst: int) -> np.ndarray:
    """(dst, src) matrix with cv2.INTER_CUBIC semantics (4-tap, A=-0.75)."""
    scale = src / dst
    fx = (np.arange(dst) + 0.5) * scale - 0.5
    x0 = np.floor(fx).astype(np.int64)
    t = fx - x0
    W = np.zeros((dst, src), dtype=np.float32)
    rows = np.arange(dst)
    for k in range(-1, 3):
        tap = np.clip(x0 + k, 0, src - 1)
        wgt = _cubic_kernel(k - t).astype(np.float32)
        np.add.at(W, (rows, tap), wgt)
    return W


@functools.lru_cache(maxsize=256)
def resize_weights_linear_align_corners(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear weights with torch align_corners=True mapping
    (src = dst * (src-1)/(dst-1)); used by UNet/MiDaS upsampling
    (reference unet_parts.py:56, midas/blocks.py:191-193)."""
    if dst == 1 or src == 1:
        W = np.zeros((dst, src), np.float32)
        W[:, 0] = 1.0
        return W
    fx = np.arange(dst) * ((src - 1) / (dst - 1))
    x0 = np.floor(fx).astype(np.int64)
    t = (fx - x0).astype(np.float32)
    W = np.zeros((dst, src), dtype=np.float32)
    rows = np.arange(dst)
    np.add.at(W, (rows, np.clip(x0, 0, src - 1)), 1.0 - t)
    np.add.at(W, (rows, np.clip(x0 + 1, 0, src - 1)), t)
    return W


def upsample_bilinear_align_corners(x: jnp.ndarray, out_h: int,
                                    out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=True) on the
    trailing two spatial dims of (..., H, W)."""
    h, w = x.shape[-2], x.shape[-1]
    Wy = jnp.asarray(resize_weights_linear_align_corners(h, out_h))
    Wx = jnp.asarray(resize_weights_linear_align_corners(w, out_w))
    prec = jax.lax.Precision.HIGHEST
    out = jnp.einsum('Hh,...hw->...Hw', Wy, x, precision=prec)
    return jnp.einsum('Ww,...Hw->...HW', Wx, out, precision=prec)


def resize_nearest(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest resize of (..., H, W) via static gathers."""
    h, w = img.shape[-2], img.shape[-1]
    yi = jnp.asarray(nearest_indices(h, out_h))
    xi = jnp.asarray(nearest_indices(w, out_w))
    return jnp.take(jnp.take(img, yi, axis=-2), xi, axis=-1)


def resize(img: jnp.ndarray, out_h: int, out_w: int,
           method: str = 'linear', precision=None) -> jnp.ndarray:
    """Resize the trailing two dims of `img` (any leading batch dims).

    method: 'nearest' | 'linear' | 'cubic'. Linear/cubic lower to two
    matmuls with static weight matrices (MXU path).

    precision: defaults to HIGHEST so the TPU MXU keeps full f32 parity
    with cv2 (the default TPU matmul rounds inputs to bf16). Pass
    jax.lax.Precision.DEFAULT for a ~2x faster bf16 fast path when 1-LSB
    deviations are acceptable.
    """
    if method == 'nearest':
        return resize_nearest(img, out_h, out_w)
    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    h, w = img.shape[-2], img.shape[-1]
    make = resize_weights_linear if method == 'linear' else resize_weights_cubic
    Wy = jnp.asarray(make(h, out_h))
    Wx = jnp.asarray(make(w, out_w))
    dtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    out = jnp.einsum('Hh,...hw->...Hw', Wy, img.astype(dtype),
                     preferred_element_type=dtype, precision=precision)
    out = jnp.einsum('Ww,...Hw->...HW', Wx, out,
                     preferred_element_type=dtype, precision=precision)
    return out
