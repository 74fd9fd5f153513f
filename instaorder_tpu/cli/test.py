"""Eval CLI — parity with reference tools/test.py flags."""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--load_model', default=None)
    ap.add_argument('--order_method', default='')
    ap.add_argument('--order_th', default=0.1, type=float)
    ap.add_argument('--amodal_th', default=0.2, type=float)
    ap.add_argument('--test_num', default=-1, type=int)
    ap.add_argument('--pairs', default='all', choices=['all', 'nbor'])
    ap.add_argument('--disp_select_method', default='')
    ap.add_argument('--save_pngs', default=0, type=int)
    ap.add_argument('--zd', default=0, type=int)
    args = ap.parse_args()

    from ..cli.config import load_config
    from ..eval.tester import Tester

    cfg = load_config(args.config)
    cfg.order_method = args.order_method
    cfg.load_model = args.load_model
    cfg.pairs = args.pairs
    cfg.zd = args.zd
    cfg.disp_select_method = args.disp_select_method
    tester = Tester(cfg, n_images=args.test_num)
    print(tester.run())


if __name__ == '__main__':
    main()
