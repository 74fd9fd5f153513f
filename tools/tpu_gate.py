#!/usr/bin/env python
"""On-TPU kernel-vs-XLA agreement gate for the serving kernel variants.

Interpret-mode (CPU) parity tests zero-fill pallas scratch buffers, so
changes that rely on hardware scratch reuse (e.g. the border-only
scratch zeroing in the hwnc conv2 phase) need a REAL-device check
before becoming defaults. This tool runs every queued kernel config on
the actual TPU against the pure-XLA oracle (same qparams, use_pallas
off) and reports max|logit delta|, rel-delta and decision agreement.

Pass bar (verify skill): decision agreement 100% and rel delta < 2%
on this real-ish workload; int8c variants must be bit-exact.

Usage: python tools/tpu_gate.py [--configs name1,name2] [--list]
Writes one line per config; exits non-zero if any config fails.
"""
import argparse
import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# (name, dtype, kwargs-for-apply)
CONFIGS = [
    ('v2-hwnc-default', 'int8', {}),
    ('v2-conv2-acc', 'int8', {'conv2_mode': 'acc'}),
    ('v2-conv2-scatter', 'int8', {'conv2_mode': 'scatter'}),
    ('v2-conv2-scatter16', 'int8', {'conv2_mode': 'scatter16'}),
    ('v2-pipeline', 'int8', {'pipeline': True}),
    ('v2-io-s8', 'int8', {'hwnc_io': 's8'}),
    ('v2-down1', 'int8', {'use_pallas': ('hwnc', 'down1')}),
    ('v2-down12', 'int8', {'use_pallas': ('hwnc', 'down1', 'down2')}),
    ('v2-stem', 'int8', {'use_pallas': ('hwnc', 'stem')}),
    ('v2-hwncs', 'int8', {'use_pallas': ('hwncs',)}),
    ('v2-hwncs1', 'int8', {'use_pallas': ('hwnc', 'down1', 'down2',
                                          'hwncs1')}),
    ('v2-hwncs-all', 'int8', {'use_pallas': ('hwnc', 'down1', 'down2',
                                             'hwncs', 'hwncs1')}),
    ('v2-hwncs1d', 'int8', {'use_pallas': ('hwnc', 'down2', 'hwncs1d')}),
    ('v2-stem2', 'int8', {'use_pallas': ('hwnc', 'down1', 'down2',
                                         'hwncs1', 'stem2')}),
    ('v2-qpool', 'int8', {'use_pallas': ('hwnc', 'down1', 'down2',
                                         'hwncs1', 'qpool')}),
    ('v2-hwncp', 'int8', {'use_pallas': ('hwnc', 'down2', 'hwncp')}),
    # tuned hwncp variants (r5 wave-3 sweep candidates): partial band
    # unroll and band-budget heuristics change the kernel's loop
    # structure, so each tuning point needs its own hardware gate
    ('v2-hwncp-u4', 'int8',
     {'use_pallas': ('hwnc', 'down2', 'hwncp'), 'stage_unroll': 4}),
    ('v2-hwncp-dirpack-u4', 'int8-siam',
     {'use_pallas': ('hwnc', 'down2', 'hwncp', 'dirpack'),
      'stage_unroll': 4}),
    ('v2-hwncp-dirpack-u4-bb12', 'int8-siam',
     {'use_pallas': ('hwnc', 'down2', 'hwncp', 'dirpack'),
      'stage_unroll': 4, 'band_budget': 12 * 1024 * 1024}),
    ('v2-hwncp-dirpack-u2-bb24', 'int8-siam',
     {'use_pallas': ('hwnc', 'down2', 'hwncp', 'dirpack'),
      'stage_unroll': 2, 'band_budget': 24 * 1024 * 1024}),
    # siamese-only layout knob: direction axis -> interleaved batch via
    # bitcasts; must be BIT-exact vs the same-kernels siamese run
    ('v2-dirpack', 'int8-siam',
     {'use_pallas': ('hwnc', 'down2', 'hwncs1d', 'dirpack')}),
    ('v2-hwncp-dirpack', 'int8-siam',
     {'use_pallas': ('hwnc', 'down2', 'hwncp', 'dirpack')}),
    ('v2-all', 'int8', {'use_pallas': ('hwnc', 'down1', 'down2', 'stem'),
                        'conv2_mode': 'scatter'}),
    ('int8c-default', 'int8c', {}),
    ('int8c-hwnc', 'int8c', {'use_pallas': ('hwnc', 'down', 'stem')}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--configs', default=None,
                    help='comma list of config names (default: all)')
    ap.add_argument('--list', action='store_true')
    ap.add_argument('--scenes', type=int, default=8,
                    help='synthetic scenes; 45 pairs each (360 at 8 — '
                         'the hwnc kernels need a sublane-aligned batch)')
    args = ap.parse_args()
    if args.list:
        for name, dt, kw in CONFIGS:
            print(name, dt, kw)
        return

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    import jax.numpy as jnp
    from instaorder_tpu.models import resnet
    from instaorder_tpu.models.folding import fold_resnet
    from instaorder_tpu.models import quantize as Q
    from instaorder_tpu.ops.pairs import (build_pair_batch_matmul,
                                          pair_rois, all_pair_indices)

    print(f'devices: {jax.devices()}', file=sys.stderr)

    params, stats, cfg = resnet.init(jax.random.PRNGKey(0), arch='resnet50',
                                     in_channels=5, num_classes=2,
                                     weight_init='xavier')
    folded = fold_resnet(params, stats, cfg)

    rng = np.random.RandomState(0)
    H, W, N, S = 480, 640, 10, args.scenes
    images = rng.randint(0, 255, (S, H, W, 3)).astype(np.float32)
    masks = np.zeros((S, N, H, W), np.float32)
    bboxes = np.zeros((S, N, 4), np.float32)
    for s in range(S):
        for k in range(N):
            y0, x0 = rng.randint(0, H - 100), rng.randint(0, W - 100)
            hh, ww = rng.randint(30, 100, 2)
            masks[s, k, y0:y0 + hh, x0:x0 + ww] = 1
            bboxes[s, k] = [x0, y0, ww, hh]
    pair_idx, _ = all_pair_indices(N)
    pair_idx_j = jnp.asarray(pair_idx)

    @jax.jit
    def prep(im, m, b):
        def one(im1, m1, b1):
            rois = pair_rois(b1, pair_idx_j)
            return build_pair_batch_matmul(im1, m1, pair_idx_j, rois,
                                           out_size=256, dtype=jnp.bfloat16)
        return jax.vmap(one)(im, m, b).reshape(-1, 256, 256, 5)

    x = prep(jnp.asarray(images), jnp.asarray(masks), jnp.asarray(bboxes))
    calib_x = np.asarray(x).astype(np.float32)
    scales = Q.calibrate_folded_resnet(folded, cfg, [calib_x])
    qp_v2 = Q.quantize_folded_v2(folded, cfg, scales)
    qp_c = Q.quantize_folded_resnet(folded, cfg, scales)

    def run(dtype, **kw):
        if dtype == 'int8':
            fn = functools.partial(Q.apply_folded_v2, qp_v2, cfg, **kw)
        elif dtype == 'int8-siam':
            base = functools.partial(Q.apply_folded_v2_siamese, qp_v2,
                                     cfg, **kw)
            fn = lambda x: jnp.stack(base(x=x))  # noqa: E731
        else:
            fn = functools.partial(Q.apply_folded_int8, qp_c, cfg,
                                   stem_chunks=kw.pop('stem_chunks', 4),
                                   **kw)
        out = jax.jit(lambda xx: fn(x=xx))(x)
        return np.asarray(jax.device_get(out), np.float32)

    sel = None if args.configs is None else set(args.configs.split(','))

    oracle = {'int8': run('int8', use_pallas=False),
              'int8c': run('int8c', use_pallas=False)}
    # bitcast layout knobs must be BIT-exact vs the SAME-KERNELS
    # siamese run (the XLA-vs-pallas oracle would hide a reorder bug
    # behind the 1-LSB tie bar): each int8-siam config's oracle is its
    # own kwargs minus 'dirpack', cached per kernel mix
    siam_oracles = {}

    def siam_oracle(kw):
        up = tuple(f for f in kw['use_pallas'] if f != 'dirpack')
        if up not in siam_oracles:
            siam_oracles[up] = run('int8-siam',
                                   **dict(kw, use_pallas=up))
        return siam_oracles[up]

    failures = []
    for name, dtype, kw in CONFIGS:
        if sel is not None and name not in sel:
            continue
        try:
            ref = siam_oracle(kw) if dtype == 'int8-siam' \
                else oracle[dtype]
            got = run(dtype, **kw)
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({'config': name, 'error': repr(e)[:4000]}))
            failures.append(name)
            continue
        delta = np.abs(got - ref)
        rel = float(delta.max() / (np.abs(ref).max() + 1e-9))
        dec_ref = (1 / (1 + np.exp(-ref))) > 0.5
        dec_got = (1 / (1 + np.exp(-got))) > 0.5
        agree = float((dec_ref == dec_got).mean())
        bitexact = bool((got == ref).all())
        ok = agree == 1.0 and rel < 0.02
        if dtype in ('int8c', 'int8-siam'):
            ok = ok and bitexact
        print(json.dumps({'config': name, 'max_abs': round(float(delta.max()), 6),
                          'rel': round(rel, 6), 'agree': agree,
                          'bitexact': bitexact, 'ok': ok}))
        sys.stdout.flush()
        if not ok:
            failures.append(name)
    if failures:
        print(f'FAIL: {failures}', file=sys.stderr)
        sys.exit(1)
    print('gate: all configs agree', file=sys.stderr)


if __name__ == '__main__':
    main()
