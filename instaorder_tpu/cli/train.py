"""Train CLI — parity with reference main.py flags.

Usage:
  python -m instaorder_tpu.cli.train --config experiments/.../config.yaml
      [--load-model PATH] [--resume] [--validate] [--seed N]
      [--n-devices N] [--out-dir DIR]

No torch.distributed.launch analogue is needed: one process drives the
whole mesh (parallel/mesh.py); multi-host would call
jax.distributed.initialize() here.
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--config', required=True)
    ap.add_argument('--load-model', default=None)
    ap.add_argument('--load-iter', default=None, type=int)
    ap.add_argument('--resume', action='store_true')
    ap.add_argument('--auto-resume', action='store_true',
                    help='elastic relaunch: if the run dir already has '
                         'checkpoints, resume from the latest one (no '
                         'path needed — the preemption/restart model: '
                         'point the relauncher at the same command line)')
    ap.add_argument('--validate', action='store_true')
    ap.add_argument('--load_pretrain', '--load-pretrain', default=None,
                    help='torch state_dict/.pth.tar to merge strict=False '
                         'onto the fresh init before training (reference '
                         'main.py:50 + single_stage_model.py:63-64)')
    # parsed-but-inert in the reference too (main.py:55-58: argparse
    # defines them, Trainer never reads them) — accepted for flag parity
    ap.add_argument('--extract', action='store_true',
                    help='accepted for reference main.py flag parity; '
                         'inert there and here')
    ap.add_argument('--evaluate', action='store_true',
                    help='accepted for reference main.py flag parity; '
                         'inert there and here')
    ap.add_argument('--evaluate-save', action='store_true',
                    help='accepted for reference main.py flag parity; '
                         'inert there and here')
    ap.add_argument('--seed', type=int, default=131)
    ap.add_argument('--n-devices', type=int, default=None)
    ap.add_argument('--out-dir', default=None)
    ap.add_argument('--multihost', action='store_true',
                    help='initialize jax.distributed for a multi-host pod '
                         '(the NCCL/slurm launcher analogue; coordinator '
                         'resolved from the TPU environment)')
    args = ap.parse_args()

    if args.multihost:
        import jax
        jax.distributed.initialize()

    from ..cli.config import load_config
    from ..train.trainer import Trainer

    cfg = load_config(args.config)
    cfg.seed = args.seed
    if args.load_pretrain:
        cfg.load_pretrain = args.load_pretrain
    trainer = Trainer(cfg, n_devices=args.n_devices, out_dir=args.out_dir)
    if args.load_model:
        path = args.load_model
        if args.load_iter is not None:
            import os
            path = os.path.join(path, f'ckpt_iter_{args.load_iter}.ckpt')
        trainer.load(path, resume=args.resume)
    elif args.auto_resume:
        import os
        from ..core.checkpoint import latest_checkpoint
        latest = latest_checkpoint(
            os.path.join(trainer.folder, 'checkpoints'))
        if latest is not None:
            trainer.load(latest, resume=True)
    trainer.run(validate_only=args.validate)


if __name__ == '__main__':
    main()
