#!/usr/bin/env python
"""Measure the directions=1 serving knob's accuracy delta on a TRAINED
net (VERDICT r2 item 4).

The swap ensemble (inference.py:196-214) averages the two mask-order
forwards; training with swap-label-permute augmentation teaches
f(swap(x)) ~ f(x)[:, ::-1], so on a trained net the single-direction
knob should be near-lossless. Random-weight fixtures cannot show this
(their two directions are uncorrelated — the e2e parity test measures
12-50%% disagreement there); this tool trains InstaOrderNet_o on the
synthetic fixture first, then reports the real delta, which README
"Serving knobs" documents.

Usage: python tools/measure_directions_delta.py [--iters 300] [--cpu]
Prints one JSON line {disagreement_pct, d1_f1, d2_f1, ...}.
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
    cli = ap.parse_args()

    if cli.cpu:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') +
            ' --xla_force_host_platform_device_count=8').strip()
    import jax
    if cli.cpu:
        jax.config.update('jax_platforms', 'cpu')

    from _delta_common import train_fixture_net, compare_predictors
    from instaorder_tpu.eval.pipeline import OrderPredictor
    from instaorder_tpu.models import resnet

    params, stats, cfg, reader, va_dir, load_image = train_fixture_net(
        cli.iters, n_devices=cli.n_devices, exp_name='directions_delta')

    preds = {d: OrderPredictor(resnet.apply, cfg, params, stats,
                               'InstaOrderNet_o', patch_or_image='patch',
                               input_size=64, directions=d)
             for d in (1, 2)}
    pct, total, means = compare_predictors(preds, reader, load_image,
                                           keys=(1, 2))
    m1, m2 = means[1], means[2]
    print(json.dumps({
        'iters': cli.iters,
        'disagreement_pct': round(pct, 2),
        'entries': total,
        'd2_recall': round(float(m2[0]), 2),
        'd2_precision': round(float(m2[1]), 2),
        'd2_f1': round(float(m2[2]), 2),
        'd1_recall': round(float(m1[0]), 2),
        'd1_precision': round(float(m1[1]), 2),
        'd1_f1': round(float(m1[2]), 2),
        'delta_f1': round(float(m1[2] - m2[2]), 2),
    }))


if __name__ == '__main__':
    main()
