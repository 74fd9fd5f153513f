#!/usr/bin/env python
"""Diagnose the pallas5 (fused_prep_pairs) bench-scale timeout.

ab_r5.log: bench --prep-rgb pallas5 timed out at 30 min (rc=124) at
1620 pairs/step, while prep_gate --fuse-masks (132 pairs) compiled and
passed in minutes. This times COMPILE and RUN separately for the
standalone prep5 call across pair scales, so we can tell a Mosaic/XLA
compile blowup from a slow-execution kernel.

Usage: python tools/diag_pallas5.py [--scales 4,12,36] [--instances 10]
One JSON line per scale: {scenes, pairs, compile_s, run_ms}.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--scales', default='4,12,36',
                    help='comma list of scene counts (45 pairs each at '
                         '--instances 10; bench serving step = 36)')
    ap.add_argument('--instances', type=int, default=10)
    ap.add_argument('--out-size', type=int, default=256)
    args = ap.parse_args()

    import jax
    jax.config.update('jax_compilation_cache_dir',
                      os.path.join(REPO, '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1)
    import jax.numpy as jnp
    from instaorder_tpu.ops import pairs as P

    print('devices:', jax.devices(), file=sys.stderr)
    rng = np.random.RandomState(0)
    H, W, N = 480, 640, args.instances
    pair_idx, _ = P.all_pair_indices(N)
    pidx = jnp.asarray(pair_idx)

    for S in [int(s) for s in args.scales.split(',')]:
        images = rng.randint(0, 255, (S, H, W, 3)).astype(np.float32)
        masks = np.zeros((S, N, H, W), np.float32)
        bboxes = np.zeros((S, N, 4), np.float32)
        for s in range(S):
            for k in range(N):
                y0, x0 = rng.randint(0, H - 100), rng.randint(0, W - 100)
                hh, ww = rng.randint(30, 100, 2)
                masks[s, k, y0:y0 + hh, x0:x0 + ww] = 1
                bboxes[s, k] = [x0, y0, ww, hh]
        rois = jax.vmap(lambda b: P.pair_rois(b, pidx))(
            jnp.asarray(bboxes))
        im_j = jnp.asarray(images)
        mk_j = jnp.asarray(masks)

        fn = jax.jit(lambda im, mk, ro: P.build_pair_batches_fused(
            im, mk, pidx, ro, out_size=args.out_size,
            dtype=jnp.bfloat16, passes=3, fuse_masks=True))
        t0 = time.time()
        lowered = fn.lower(im_j, mk_j, rois)
        compiled = lowered.compile()
        t1 = time.time()
        out = compiled(im_j, mk_j, rois)
        jax.device_get(out[..., 0, 0])  # force a real value
        t2 = time.time()
        # second run: executable + buffers warm; alternate nothing —
        # this is a lower bound, cross-check vs bench numbers
        out = compiled(im_j, mk_j, rois)
        jax.device_get(out[..., 0, 0])
        t3 = time.time()
        print(json.dumps({
            'scenes': S, 'pairs': S * pair_idx.shape[0],
            'compile_s': round(t1 - t0, 1),
            'first_run_ms': round((t2 - t1) * 1e3, 1),
            'second_run_ms': round((t3 - t2) * 1e3, 1)}))
        sys.stdout.flush()


if __name__ == '__main__':
    main()
