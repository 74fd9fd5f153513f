"""Batched order decoding — all pairs, both directions, one device call.

Replaces the reference's per-pair Python loops with per-pair host<->device
round trips (inference.py:196-214, 44-77, 140-193, 349-624). The decode
rules are bit-compatible:

  occlusion (InstaOrderNet_o, inference.py:196-214):
    prob_i_over_j = (sig(out1)[:, 1] + sig(out2)[:, 0]) / 2 ; > 0.5
    [NB: out1 column 0 is "j over i", column 1 is "i over j" — the pair
     dataset stores [b_over_a, a_over_b], occ_order_dataset.py:277]

  OrderNet (inference.py:44-77):
    argmax of averaged (p_1over2, p_2over1, p_none, p_both), p_both = 0
    for the 3-class model.

  depth (inference.py:172-193): argmax of averaged (closer, farther, equal).

Matrix assembly (inference.py:417-434, 507-510, 612-623):
  occ:   order[i, j] = 1 iff i-over-j
  depth: closer  -> [i,j]=1, [j,i]=0 ; farther -> [i,j]=0, [j,i]=1 ;
         equal -> both 2. Cells of skipped pairs stay 0.

All functions take outputs for the PAIR batch in both directions (out1 =
forward with (mask_i, mask_j), out2 = swapped) plus a validity mask for
padded pair slots, and scatter into (N, N) matrices on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def occ_pair_probs(out1, out2=None):
    """(P, 2) sigmoid-averaged (prob_i_over_j, prob_j_over_i).
    out2=None: single-direction serving mode — skip the swap-ensemble
    average (the reference always averages both directions; this is the
    OrderPredictor(directions=1) speed knob)."""
    s1 = jax.nn.sigmoid(out1)
    if out2 is None:
        return s1[:, 1], s1[:, 0]
    s2 = jax.nn.sigmoid(out2)
    p_ij = (s1[:, 1] + s2[:, 0]) / 2.0
    p_ji = (s1[:, 0] + s2[:, 1]) / 2.0
    return p_ij, p_ji


def decode_occ(out1, out2=None, th=0.5):
    """-> (P,) bool i_over_j, (P,) bool j_over_i."""
    p_ij, p_ji = occ_pair_probs(out1, out2)
    return p_ij > th, p_ji > th


def decode_ordernet(out1, out2=None):
    """OrderNet softmax-average argmax -> (i_over_j, j_over_i) bools.
    Handles 3- and 4-class heads (ext adds bidirectional)."""
    s1 = jax.nn.softmax(out1, axis=-1)
    if out2 is None:
        p12, p21, pno = s1[:, 1], s1[:, 0], s1[:, 2]
        pbo = (s1[:, 3] if out1.shape[-1] == 4
               else jnp.zeros_like(p12))
    else:
        s2 = jax.nn.softmax(out2, axis=-1)
        p12 = (s1[:, 1] + s2[:, 0]) / 2.0
        p21 = (s1[:, 0] + s2[:, 1]) / 2.0
        pno = (s1[:, 2] + s2[:, 2]) / 2.0
        if out1.shape[-1] == 4:
            pbo = (s1[:, 3] + s2[:, 3]) / 2.0
        else:
            pbo = jnp.zeros_like(p12)
    stacked = jnp.stack([p12, p21, pno, pbo], axis=1)
    arg = jnp.argmax(stacked, axis=1)
    i_over_j = (arg == 0) | (arg == 3)
    j_over_i = (arg == 1) | (arg == 3)
    return i_over_j, j_over_i


def decode_depth(out1, out2=None):
    """3-way depth argmax -> (P,) in {0: i closer, 1: i farther, 2: eq}."""
    s1 = jax.nn.softmax(out1, axis=-1)
    if out2 is None:
        closer, farther, equal = s1[:, 0], s1[:, 1], s1[:, 2]
    else:
        s2 = jax.nn.softmax(out2, axis=-1)
        closer = (s1[:, 0] + s2[:, 1]) / 2.0
        farther = (s1[:, 1] + s2[:, 0]) / 2.0
        equal = (s1[:, 2] + s2[:, 2]) / 2.0
    return jnp.argmax(jnp.stack([closer, farther, equal], axis=1), axis=1)


def occ_matrix(n, pair_idx, i_over_j, j_over_i, valid):
    """Scatter pair decisions into the (N, N) occlusion matrix."""
    m = jnp.zeros((n, n), jnp.int32)
    iv = valid & i_over_j
    jv = valid & j_over_i
    m = m.at[pair_idx[:, 0], pair_idx[:, 1]].max(iv.astype(jnp.int32))
    m = m.at[pair_idx[:, 1], pair_idx[:, 0]].max(jv.astype(jnp.int32))
    return m


def depth_matrix(n, pair_idx, argidx, valid):
    """Scatter depth decisions into the (N, N) depth matrix."""
    ij = jnp.where(argidx == 0, 1, jnp.where(argidx == 2, 2, 0))
    ji = jnp.where(argidx == 1, 1, jnp.where(argidx == 2, 2, 0))
    m = jnp.zeros((n, n), jnp.int32)
    m = m.at[pair_idx[:, 0], pair_idx[:, 1]].max(
        jnp.where(valid, ij, 0).astype(jnp.int32))
    m = m.at[pair_idx[:, 1], pair_idx[:, 0]].max(
        jnp.where(valid, ji, 0).astype(jnp.int32))
    return m


def midas_region_depth_order(pixel_depth, mask1, mask2,
                             method='median'):
    """Pretrained-MiDaS baseline decode (inference.py:79-104): region
    depth = mean/median of per-pixel depth clipped to its [q05, q95]
    inside each mask; 0 closer / 1 farther / 2 equal.

    pixel_depth: (H, W); masks: (H, W) bool."""
    def region(d, m):
        vals = jnp.where(m, d, jnp.nan)
        lo = jnp.nanquantile(vals, 0.05)
        hi = jnp.nanquantile(vals, 0.95)
        c = jnp.clip(vals, lo, hi)
        return (jnp.nanmedian(c) if method == 'median'
                else jnp.nanmean(c))
    d1 = region(pixel_depth, mask1.astype(bool))
    d2 = region(pixel_depth, mask2.astype(bool))
    return jnp.where(d1 < d2, 0, jnp.where(d1 > d2, 1, 2))
