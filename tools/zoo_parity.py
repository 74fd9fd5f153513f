#!/usr/bin/env python
"""Released-checkpoint accuracy-parity driver (VERDICT item: 'keep the
harness ready' — blocked in this sandbox only by the absence of the
assets themselves).

Given a directory holding the reference's released zoo
(InstaOrder_{ALGO}.pth.tar, reference README.md:53-67) and the real
datasets at the config-resolved paths, this converts each checkpoint
(compat/convert_cli.py) and runs the matching experiment eval
(eval/tester.py), printing every metric and — when an expected-values
YAML is given — the delta vs paper Table 3 with a ±0.1 pass/fail.

Usage:
  python tools/zoo_parity.py --zoo-dir /path/to/zoo \
      [--only InstaOrderNet_o,...] [--expected expected.yaml] \
      [--test-num -1]

expected.yaml format (fill from the paper; values are x100 like the
Tester's output):
  InstaOrderNet_o: {recall: 88.3, precision: 76.0, f1: 80.1}
  InstaOrderNet_d: {whdr_all: 11.5}
  ...
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

# released checkpoint file -> (algo, experiment config dir)
ZOO = {
    'InstaOrder_OrderNet.pth.tar': ('OrderNet', 'InstaOrder/OrderNet'),
    'InstaOrder_OrderNet_ext.pth.tar':
        ('OrderNet_ext', 'InstaOrder/OrderNet_ext'),
    'InstaOrder_InstaOrderNet_o.pth.tar':
        ('InstaOrderNet_o', 'InstaOrder/InstaOrderNet_o'),
    'InstaOrder_InstaOrderNet_d.pth.tar':
        ('InstaOrderNet_d', 'InstaOrder/InstaOrderNet_d'),
    'InstaOrder_InstaOrderNet_od.pth.tar':
        ('InstaOrderNet_od', 'InstaOrder/InstaOrderNet_od'),
    'InstaOrder_InstaDepthNet_d.pth.tar':
        ('InstaDepthNet_d', 'InstaOrder/InstaDepthNet_d'),
    'InstaOrder_InstaDepthNet_od.pth.tar':
        ('InstaDepthNet_od', 'InstaOrder/InstaDepthNet_od'),
    'InstaOrder_pcnet_m.pth.tar': ('pcnet_m', 'InstaOrder/pcnet_m'),
    'COCOA_InstaOrderNet_o.pth.tar': ('InstaOrderNet_o',
                                      'COCOA/InstaOrderNet_o'),
    'COCOA_pcnet_m.pth.tar': ('pcnet_m', 'COCOA/pcnet_m'),
    'KINS_InstaOrderNet_o.pth.tar': ('InstaOrderNet_o',
                                     'KINS/InstaOrderNet_o'),
    'KINS_pcnet_m.pth.tar': ('pcnet_m', 'KINS/pcnet_m'),
    'InstaOrder_midas_pretrained.pth.tar':
        ('midas_pretrained', 'InstaOrder/midas_pretrained'),
}


def run_one(src, algo, exp, out_dir, test_num=-1, exp_root=None,
            data_overrides=None, model_overrides=None):
    """Convert one released checkpoint and run its experiment eval;
    returns the Tester metrics dict. data_overrides/model_overrides
    merge into the experiment config's .data/.model dicts so the smoke
    test (tests/test_zoo_parity_smoke.py) can aim the identical wiring
    at a synthetic fixture — the zoo run passes None and uses the
    config verbatim."""
    from instaorder_tpu.compat.convert_cli import convert
    from instaorder_tpu.cli.config import load_config
    from instaorder_tpu.eval.tester import Tester

    exp_root = exp_root or os.path.join(os.path.dirname(__file__), '..',
                                        'experiments')
    os.makedirs(out_dir, exist_ok=True)
    ck = os.path.join(out_dir,
                      os.path.basename(src).replace('.pth.tar', '.ckpt'))
    if not os.path.exists(ck):
        convert(src, algo, ck)
    cfg = load_config(os.path.join(exp_root, exp, 'config.yaml'))
    cfg.load_model = ck
    cfg.order_method = getattr(cfg, 'order_method', '') or ''
    cfg.pairs = 'all'
    cfg.zd = 0
    cfg.disp_select_method = ''
    cfg.data.update(data_overrides or {})
    cfg.model.update(model_overrides or {})
    tester = Tester(cfg, n_images=test_num)
    return tester.run()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--zoo-dir', required=True)
    ap.add_argument('--only', default=None,
                    help='comma list of algo names to run')
    ap.add_argument('--expected', default=None,
                    help='YAML of paper Table-3 values (see docstring)')
    ap.add_argument('--test-num', default=-1, type=int)
    ap.add_argument('--out-dir', default='/tmp/zoo_parity')
    args = ap.parse_args()

    expected = {}
    if args.expected:
        import yaml
        with open(args.expected) as f:
            expected = yaml.safe_load(f) or {}

    only = set(args.only.split(',')) if args.only else None
    results, failures = {}, []
    for fn, (algo, exp) in ZOO.items():
        if only and algo not in only:
            continue
        src = os.path.join(args.zoo_dir, fn)
        if not os.path.exists(src):
            print(f'SKIP {fn}: not in --zoo-dir', file=sys.stderr)
            continue
        metrics = run_one(src, algo, exp, args.out_dir,
                          test_num=args.test_num)
        results[f'{exp}'] = metrics
        want = expected.get(algo) or expected.get(exp) or {}
        for k, v in (want or {}).items():
            got = metrics.get(k)
            ok = got is not None and abs(float(got) - float(v)) <= 0.1
            line = (f'{exp} {k}: got {got} want {v} '
                    f'{"OK" if ok else "FAIL"}')
            print(line)
            if not ok:
                failures.append(line)
    print(json.dumps(results, default=float))
    if failures:
        sys.exit(f'{len(failures)} parity failures')


if __name__ == '__main__':
    main()
