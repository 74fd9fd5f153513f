"""Dense-disparity eval CLI — parity with tools/test_disp_DIW.py and
tools/test_disp_KITTI.py."""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--load_model', default=None)
    ap.add_argument('--test_num', default=-1, type=int)
    ap.add_argument('--convert', default='median')
    args = ap.parse_args()

    from ..cli.config import load_config
    from ..eval.disp import make_disp_forward, eval_diw, eval_dense_depth
    from ..data import readers as R

    cfg = load_config(args.config)
    data = cfg.data
    algo = cfg.model['algo']
    fwd = make_disp_forward(algo, args.load_model,
                            features=cfg.model.get('features', 256)
                            if isinstance(cfg.model, dict) else 256)

    dataset = data['dataset'].lower()
    if dataset == 'diw':
        reader = R.DIWReader(data['val_annot_file'], data['val_image_root'],
                             data['data_mean'], data['data_std'])
        print(eval_diw(fwd, reader, n_samples=args.test_num))
    elif dataset in ('kitti', 'nyu'):
        cls = R.KITTIReader if dataset == 'kitti' else R.NYUReader
        reader = cls(data['val_annot_file'], data['val_image_root'],
                     data['data_mean'], data['data_std'])
        print(eval_dense_depth(fwd, reader, dataset,
                               n_samples=args.test_num))
    else:
        raise ValueError(dataset)


if __name__ == '__main__':
    main()
