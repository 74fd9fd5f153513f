#!/usr/bin/env python
"""Multi-seed directions=1 admissibility study (VERDICT r4 item 3).

The directions=2 default reproduces the reference's swap ensemble
(inference.py:196-214): every pair is forwarded with both mask orders
and the sigmoids averaged. `OrderPredictor(directions=1)` skips the
second forward — the serving speed knob (~1.6x pairs/s). This study
makes the accuracy case for (or against) that knob rigorous:

  * N independent seeds — independent fixture draws, trainer seeds and
    inits — each trained >= 1k iters (past the LR drop at 2/3), so the
    delta has a confidence interval instead of one point;
  * per-seed occlusion R/P/F1 for d1 and d2 over the same val scenes
    (and WHDR for --algo InstaOrderNet_od), exact paired deltas;
  * threshold-margin analysis: for every DISAGREEING pair decision,
    how far the d2 ensemble probability sat from the 0.5 threshold.
    The ensemble is an inference-time tie-break (swap augmentation
    already supervises both orders at train time,
    occ_order_dataset.py:270-280) — if disagreements concentrate at
    |p - 0.5| -> 0 they are coin flips the bar should not charge to
    the knob, while margin mass far from 0.5 would falsify that.

Decision rule (documented in README "Serving knobs"): directions=1 is
admissible as the official serving number iff the 95% t-CI upper
bound of the mean F1 LOSS (F1_d2 - F1_d1) is <= 0.1 (the zoo_parity
Table-3 bar, in F1 percentage points).

Usage:
  python tools/study_directions.py [--seeds 5] [--iters 1000] [--cpu]
                                   [--algo InstaOrderNet_od] [--out f]
Prints one JSON document (per-seed rows + aggregate + verdict).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
sys.path.insert(0, os.path.dirname(__file__))

# two-sided 95% Student-t quantiles, df = n-1 (numpy has no t ppf)
_T95 = {1: 12.706, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571, 6: 2.447,
        7: 2.365, 8: 2.306, 9: 2.262, 10: 2.228, 14: 2.145, 19: 2.093}


def t95(df):
    if df in _T95:
        return _T95[df]
    keys = sorted(_T95)
    for k in keys:
        if k >= df:
            return _T95[k]
    return 1.96


def eval_seed(seed, iters, algo, n_devices, val_images=8):
    """Train one seed, evaluate d1 vs d2 on its val scenes. Returns a
    dict with paired metrics + disagreement margins."""
    import jax.numpy as jnp
    from _delta_common import train_fixture_net
    from instaorder_tpu.eval.pipeline import OrderPredictor
    from instaorder_tpu.eval import decode as D
    from instaorder_tpu.eval.metrics import (
        eval_order_recall_precision_f1, eval_depth_order_whdr)
    from instaorder_tpu.models import resnet

    params, stats, cfg, reader, va_dir, load_image = train_fixture_net(
        iters, n_devices=n_devices, exp_name=f'dirstudy_s{seed}',
        seed=seed, algo=algo, val_images=val_images)
    # ONE directions=2 predictor: d1 decisions are the same out1 with
    # the ensemble average skipped (decode contract, eval/decode.py) —
    # exactly what OrderPredictor(directions=1) computes, but paired
    # on identical forwards so the comparison is noise-free.
    pred = OrderPredictor(resnet.apply, cfg, params, stats, algo,
                          patch_or_image='patch', input_size=64,
                          directions=2)

    rpf = {1: [], 2: []}
    whdr = {1: [], 2: []}
    margins_dis = []     # |p_d2 - 0.5| at disagreeing decisions
    margins_all = []     # |p_d2 - 0.5| everywhere (the base rate)
    dis = tot = 0
    for idx in range(reader.get_image_length()):
        image, masks, ebb = load_image(idx)
        gt_occ = reader.get_gt_ordering(idx, 'occlusion', 0)
        pair_idx, valid, out1, out2, n = pred._pair_outputs(
            image, masks, ebb)
        occ1 = out1[0] if isinstance(out1, tuple) else out1
        occ2 = out2[0] if isinstance(out2, tuple) else out2
        v = np.asarray(valid)
        p_ij = {}
        p_ji = {}
        p_ij[1], p_ji[1] = (np.asarray(x) for x in
                            D.occ_pair_probs(occ1, None))
        p_ij[2], p_ji[2] = (np.asarray(x) for x in
                            D.occ_pair_probs(occ1, occ2))
        mats = {}
        for d in (1, 2):
            mats[d] = np.asarray(D.occ_matrix(
                n, jnp.asarray(pair_idx),
                jnp.asarray(p_ij[d] > 0.5), jnp.asarray(p_ji[d] > 0.5),
                jnp.asarray(v)))
            rpf[d].append(
                eval_order_recall_precision_f1(mats[d], gt_occ, 0))
        for a, b in ((p_ij[1], p_ij[2]), (p_ji[1], p_ji[2])):
            m2 = np.abs(b - 0.5)
            d_mask = ((a > 0.5) != (b > 0.5)) & v
            margins_dis.extend(m2[d_mask].tolist())
            margins_all.extend(m2[v].tolist())
            dis += int(d_mask.sum())
            tot += int(v.sum())
        if algo == 'InstaOrderNet_od':
            gt_d = reader.get_gt_ordering(idx, 'depth', 0)
            dep1, dep2 = out1[1], out2[1]
            for d, o2 in ((1, None), (2, dep2)):
                arg = D.decode_depth(dep1, o2)
                dm = np.asarray(D.depth_matrix(n, jnp.asarray(pair_idx),
                                               arg, jnp.asarray(v)))
                per = eval_depth_order_whdr(dm, gt_d)
                vals = [x for x in per['ovlOX_all'] if x >= 0]
                whdr[d].append(np.mean(vals) if vals else np.nan)

    row = {'seed': seed, 'disagreement_pct': 100.0 * dis / max(tot, 1),
           # per-scene paired F1s [d1, d2] — the pooled bootstrap's
           # resampling unit (scenes are the independent draws; per-seed
           # mean F1 at 8 scenes quantizes deltas into multi-point jumps)
           'scene_f1': [[float(rpf[1][i][2]), float(rpf[2][i][2])]
                        for i in range(len(rpf[1]))]}
    if algo == 'InstaOrderNet_od':
        row['scene_whdr'] = [[float(whdr[1][i]), float(whdr[2][i])]
                             for i in range(len(whdr[1]))]
    for d in (1, 2):
        r, p, f = (float(np.mean([x[i] for x in rpf[d]]))
                   for i in range(3))
        row[f'd{d}_recall'], row[f'd{d}_precision'], row[f'd{d}_f1'] = \
            r, p, f
        if algo == 'InstaOrderNet_od':
            row[f'd{d}_whdr'] = float(np.nanmean(whdr[d]))
    row['delta_f1'] = row['d1_f1'] - row['d2_f1']
    if algo == 'InstaOrderNet_od':
        row['delta_whdr'] = row['d1_whdr'] - row['d2_whdr']
    md = np.asarray(margins_dis)
    ma = np.asarray(margins_all)
    row['margins'] = {
        'n_disagree': int(md.size),
        'disagree_median': float(np.median(md)) if md.size else None,
        'disagree_p90': float(np.percentile(md, 90)) if md.size else None,
        'disagree_max': float(md.max()) if md.size else None,
        'all_median': float(np.median(ma)) if ma.size else None,
    }
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--seeds', type=int, default=5)
    ap.add_argument('--iters', type=int, default=1000)
    ap.add_argument('--algo', default='InstaOrderNet_o',
                    choices=['InstaOrderNet_o', 'InstaOrderNet_od'])
    ap.add_argument('--cpu', action='store_true')
    ap.add_argument('--n-devices', type=int, default=None)
    ap.add_argument('--out', default=None, help='also write JSON here')
    ap.add_argument('--bar', type=float, default=0.1,
                    help='admissibility bar on the F1-loss CI upper '
                         'bound (percentage points)')
    ap.add_argument('--val-images', type=int, default=8,
                    help='held-out scenes per seed; the r5 first pass '
                         'at 8 showed per-seed dF1 noise of ~5 F1 pts '
                         'from val granularity alone — raise to shrink '
                         'the CI')
    ap.add_argument('--rows-dir', default=None,
                    help='persist each seed row as <dir>/seed<k>.json '
                         'and skip seeds whose row already exists, so '
                         'a killed multi-hour run resumes for free')
    cli = ap.parse_args()

    if cli.cpu:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '') +
            ' --xla_force_host_platform_device_count=8').strip()
    import jax
    if cli.cpu:
        jax.config.update('jax_platforms', 'cpu')
    else:
        jax.config.update(
            'jax_compilation_cache_dir',
            os.path.join(os.path.dirname(__file__), '..', '.jax_cache'))

    rows = []
    for s in range(cli.seeds):
        rowf = (os.path.join(cli.rows_dir, f'seed{s}.json')
                if cli.rows_dir else None)
        if rowf and os.path.exists(rowf):
            with open(rowf) as f:
                rows.append(json.load(f))
            continue
        row = eval_seed(s, cli.iters, cli.algo, cli.n_devices,
                        val_images=cli.val_images)
        rows.append(row)
        if rowf:
            os.makedirs(cli.rows_dir, exist_ok=True)
            with open(rowf, 'w') as f:
                json.dump(row, f)
            print(f'[seed {s}] delta_f1={row["delta_f1"]:+.4f} '
                  f'-> {rowf}', file=sys.stderr)

    deltas = np.asarray([r['delta_f1'] for r in rows])  # d1 - d2
    n = deltas.size
    mean = float(deltas.mean())
    sd = float(deltas.std(ddof=1)) if n > 1 else float('nan')
    half = t95(n - 1) * sd / np.sqrt(n) if n > 1 else float('nan')
    # loss = d2 - d1 = -delta; CI upper bound of the loss
    loss_hi = -mean + half
    agg = {
        'algo': cli.algo, 'seeds': n, 'iters': cli.iters,
        'delta_f1_mean': round(mean, 4),
        'delta_f1_sd': round(sd, 4),
        'delta_f1_ci95': [round(mean - half, 4), round(mean + half, 4)],
        'f1_loss_ci95_upper': round(loss_hi, 4),
        'bar': cli.bar,
        'admissible': bool(loss_hi <= cli.bar),
        'disagreement_pct_mean': round(
            float(np.mean([r['disagreement_pct'] for r in rows])), 3),
        'disagree_margin_median': round(float(np.median(
            [r['margins']['disagree_median'] for r in rows
             if r['margins']['disagree_median'] is not None] or
            [np.nan])), 4),
        'all_margin_median': round(float(np.median(
            [r['margins']['all_median'] for r in rows])), 4),
    }
    # pooled per-scene paired bootstrap: scenes (from ALL seeds) are the
    # independent resampling unit, so the CI reflects val-sampling noise
    # directly instead of the per-seed mean's coarse granularity. Rows
    # from the pre-scene-storage tool version are skipped gracefully.
    scenes = np.asarray([s for r in rows for s in r.get('scene_f1', [])],
                        dtype=np.float64)
    if scenes.size:
        dsc = scenes[:, 0] - scenes[:, 1]          # d1 - d2 per scene
        rng = np.random.RandomState(0)
        m = dsc.size
        boots = np.asarray([dsc[rng.randint(0, m, m)].mean()
                            for _ in range(10000)])
        lo, hi = (float(np.percentile(boots, q)) for q in (2.5, 97.5))
        agg['pooled'] = {
            'n_scenes': int(m),
            'delta_f1_mean': round(float(dsc.mean()), 4),
            'delta_f1_ci95_bootstrap': [round(lo, 4), round(hi, 4)],
            'f1_loss_ci95_upper': round(-lo, 4),
            'admissible': bool(-lo <= cli.bar),
        }
    if cli.algo == 'InstaOrderNet_od':
        dw = np.asarray([r['delta_whdr'] for r in rows])
        mw = float(dw.mean())
        sw = float(dw.std(ddof=1)) if n > 1 else float('nan')
        hw = t95(n - 1) * sw / np.sqrt(n) if n > 1 else float('nan')
        agg['delta_whdr_mean'] = round(mw, 4)
        agg['delta_whdr_ci95'] = [round(mw - hw, 4), round(mw + hw, 4)]
        # pooled per-scene WHDR bootstrap, same resampling unit as F1
        # (scenes with no valid depth pairs carry NaN — dropped pairwise)
        wsc = np.asarray([s for r in rows
                          for s in r.get('scene_whdr', [])],
                         dtype=np.float64)
        wsc = wsc[~np.isnan(wsc).any(axis=1)] if wsc.size else wsc
        if wsc.size:
            dws = wsc[:, 0] - wsc[:, 1]            # d1 - d2 (lower=better)
            rng = np.random.RandomState(0)
            m = dws.size
            boots = np.asarray([dws[rng.randint(0, m, m)].mean()
                                for _ in range(10000)])
            lo, hi = (float(np.percentile(boots, q)) for q in (2.5, 97.5))
            agg['pooled_whdr'] = {
                'n_scenes': int(m),
                'delta_whdr_mean': round(float(dws.mean()), 4),
                'delta_whdr_ci95_bootstrap': [round(lo, 4),
                                              round(hi, 4)],
                # WHDR is an error rate: the LOSS upper bound is the
                # CI's upper end (positive = d1 worse)
                'whdr_loss_ci95_upper': round(hi, 4),
            }
    doc = {'aggregate': agg, 'per_seed': rows}
    txt = json.dumps(doc, indent=1)
    print(txt)
    if cli.out:
        with open(cli.out, 'w') as f:
            f.write(txt + '\n')


if __name__ == '__main__':
    main()
