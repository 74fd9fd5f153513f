#!/usr/bin/env python
"""Measure the boundary-int8 v2 serving default's accuracy delta vs the
f32 predictor on a TRAINED net (companion to measure_directions_delta:
random-weight fixtures put logits at the decision threshold, overstating
quantization flips; a trained net shows the real serving delta that the
bench default `--dtype int8` implies).

Trains InstaOrderNet_o on the synthetic fixture (shared recipe in
tools/_delta_common.py), converts to the v2 predictor
(make_v2_predictor, calibrated on held-out pair batches), and reports
matrix disagreement + R/P/F1 deltas vs f32.

Usage: python tools/measure_v2_delta.py [--iters 300] [--cpu]
Prints one JSON line. Measured (120 iters, CPU): 0.00% disagreement,
dF1 = 0.00 — documented in README "Serving knobs".
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

    import numpy as np
    import jax.numpy as jnp
    from _delta_common import train_fixture_net, compare_predictors
    from instaorder_tpu.eval.pipeline import (OrderPredictor,
                                              make_v2_predictor)
    from instaorder_tpu.models import resnet
    from instaorder_tpu.ops.pairs import all_pair_indices

    params, stats, cfg, reader, va_dir, load_image = train_fixture_net(
        cli.iters, n_devices=cli.n_devices, exp_name='v2_delta')

    pred_f32 = OrderPredictor(resnet.apply, cfg, params, stats,
                              'InstaOrderNet_o', patch_or_image='patch',
                              input_size=64)
    # calibrate the v2 predictor on the first val images' pair batches
    # (held-out data, the PTQ recipe in models/quantize.py)
    calib = []
    for idx in range(2):
        image, masks, ebb = load_image(idx)
        pi, _ = all_pair_indices(masks.shape[0])
        x, _ = pred_f32._build_batch(jnp.asarray(image),
                                     jnp.asarray(masks),
                                     jnp.asarray(ebb), jnp.asarray(pi))
        calib.append(np.asarray(x, np.float32))
    pred_v2 = make_v2_predictor(params, stats, cfg, 'InstaOrderNet_o',
                                calib, patch_or_image='patch',
                                input_size=64)

    pct, total, means = compare_predictors(
        {'f32': pred_f32, 'v2': pred_v2}, reader, load_image,
        keys=('f32', 'v2'))
    mf, mv = means['f32'], means['v2']
    print(json.dumps({
        'iters': cli.iters,
        'disagreement_pct': round(pct, 2),
        'entries': total,
        'f32_recall': round(float(mf[0]), 2),
        'f32_precision': round(float(mf[1]), 2),
        'f32_f1': round(float(mf[2]), 2),
        'v2_recall': round(float(mv[0]), 2),
        'v2_precision': round(float(mv[1]), 2),
        'v2_f1': round(float(mv[2]), 2),
        'delta_f1': round(float(mv[2] - mf[2]), 2),
    }))


if __name__ == '__main__':
    main()
