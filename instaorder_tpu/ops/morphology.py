"""On-device binary morphology.

The reference's hot-loop morphology is host-side C:
  * scipy.ndimage.binary_erosion inside the InstaDepthNet dorder loss —
    forcing a device->host sync per batch element per step
    (reference models/supervised_order.py:160-164).
  * cv2.dilate with a 3x3 cross for the `bordering` pair filter
    (reference inference.py:691-696).

Both use the 4-connected cross structuring element, which decomposes into
five shifted copies — pure VPU element-wise work, fused by XLA, no host
round trip. Border semantics: out-of-image is 0 for both (scipy default
border_value=0; cv2.dilate of a 0/1 mask with BORDER_CONSTANT-like edges —
cv2 actually replicates borders, but replicating a binary mask's edge is
equivalent to 0-padding for dilation OR because the edge pixel itself is
already included by the identity term).
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift(x: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift trailing 2 dims by (dy, dx), filling vacated area with `fill`."""
    pad = [(0, 0)] * (x.ndim - 2) + [
        (max(dy, 0), max(-dy, 0)),
        (max(dx, 0), max(-dx, 0)),
    ]
    x = jnp.pad(x, pad, constant_values=fill)
    h, w = x.shape[-2], x.shape[-1]
    ys = slice(0, h - abs(dy)) if dy >= 0 else slice(abs(dy), h)
    xs = slice(0, w - abs(dx)) if dx >= 0 else slice(abs(dx), w)
    return x[..., ys, xs]


def binary_erosion(mask: jnp.ndarray) -> jnp.ndarray:
    """4-connected erosion of (..., H, W) boolean mask, border_value=0.

    Matches scipy.ndimage.binary_erosion's default structure exactly.
    """
    m = mask.astype(jnp.bool_)
    out = m
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        out = out & _shift(m, dy, dx, False)
    return out


def binary_dilation(mask: jnp.ndarray) -> jnp.ndarray:
    """4-connected dilation of (..., H, W) boolean mask."""
    m = mask.astype(jnp.bool_)
    out = m
    for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        out = out | _shift(m, dy, dx, False)
    return out


def bordering_matrix(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) instance masks -> (N, N) bool: do i and j touch?

    bordering(i, j) := any(dilate(mask_i) & mask_j)  (reference
    inference.py:691-696). One dilation pass + one (N, HW) x (HW, N)
    matmul on the MXU replaces the reference's per-pair cv2 calls.
    """
    n = masks.shape[0]
    d = binary_dilation(masks).reshape(n, -1).astype(jnp.float32)
    m = masks.reshape(n, -1).astype(jnp.float32)
    overlap = jnp.dot(d, m.T, preferred_element_type=jnp.float32)
    touch = overlap > 0
    return touch & ~jnp.eye(n, dtype=bool)
