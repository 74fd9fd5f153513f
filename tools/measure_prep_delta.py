#!/usr/bin/env python
"""Decision-level accuracy gate for the fast-prep serving knobs:
`prep_impl='pallas5'` (fused 5-channel pair prep) at passes=3
(serving precision) and passes=1 (`bench.py --prep-precision default`,
the 1-pass bf16 RGB fast knob), each vs the cv2-exact einsum prep.

The numeric gate (tools/prep_gate.py) bounds elementwise RGB error
(p3: <1% of pixels off by one bf16 grid step; p1: 22.8% of elements,
max 0.055 in normalized units) but says nothing about DECISIONS. This
trains InstaOrderNet_o on the synthetic fixture (shared recipe,
tools/_delta_common.py — same one the README "Serving knobs" deltas
use) and reports order-matrix disagreement + R/P/F1 deltas of each
prep variant against the einsum reference predictor on held-out
scenes. Reference prep contract: inference.py:360-408 (crop + cubic
resize per pair).

Usage: python tools/measure_prep_delta.py [--iters 300] [--cpu]
Prints one JSON document.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--iters', type=int, default=300)
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--n-devices', type=int, default=None)
    ap.add_argument('--seed', type=int, default=0)
    cli = ap.parse_args()

    if cli.cpu:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') +
            ' --xla_force_host_platform_device_count=8').strip()
    import jax
    if cli.cpu:
        jax.config.update('jax_platforms', 'cpu')
        # the fused prep kernel runs in interpret mode off-TPU
        prep_interpret = True
    else:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))
        prep_interpret = False

    from _delta_common import train_fixture_net, compare_predictors
    from instaorder_tpu.eval.pipeline import OrderPredictor
    from instaorder_tpu.models import resnet

    params, stats, cfg, reader, va_dir, load_image = train_fixture_net(
        cli.iters, n_devices=cli.n_devices, exp_name='prep_delta',
        seed=cli.seed)

    def make(**kw):
        return OrderPredictor(resnet.apply, cfg, params, stats,
                              'InstaOrderNet_o', patch_or_image='patch',
                              input_size=64, **kw)

    preds = {
        'einsum': make(),
        'p3': make(prep_impl='pallas5', prep_passes=3,
                   prep_interpret=prep_interpret),
        'p1': make(prep_impl='pallas5', prep_passes=1,
                   prep_interpret=prep_interpret),
    }

    out = {'iters': cli.iters, 'seed': cli.seed}
    for k in ('p3', 'p1'):
        pct, total, means = compare_predictors(
            preds, reader, load_image, keys=('einsum', k))
        me, mk = means['einsum'], means[k]
        out[k] = {
            'disagreement_pct': round(pct, 2),
            'entries': total,
            'einsum_f1': round(float(me[2]), 2),
            f'{k}_f1': round(float(mk[2]), 2),
            'delta_f1': round(float(mk[2] - me[2]), 2),
        }
    print(json.dumps(out, indent=1))


if __name__ == '__main__':
    main()
