"""Train-CLI flag surface (reference main.py:15-63): multihost launcher
wiring, pretrain plumb-through, inert parity flags, validate-only mode."""

import sys
import types
from unittest import mock

import numpy as np
import pytest


def _run_cli(argv, monkeypatch):
    """Invoke cli.train.main() with Trainer and jax.distributed mocked;
    returns (trainer_calls, distributed_initialized, run_kwargs)."""
    import jax
    from instaorder_tpu.cli import train as cli_train

    calls = {}

    class FakeTrainer:
        def __init__(self, cfg, n_devices=None, out_dir=None):
            calls['cfg'] = cfg
            calls['n_devices'] = n_devices
            self.folder = out_dir or '.'  # real Trainer attribute (trainer.py:117)

        def load(self, path, resume=False):
            calls['load'] = (path, resume)

        def run(self, validate_only=False):
            calls['validate_only'] = validate_only

    init = mock.Mock()
    monkeypatch.setattr(jax.distributed, 'initialize', init)
    monkeypatch.setattr('instaorder_tpu.train.trainer.Trainer', FakeTrainer)
    monkeypatch.setattr(sys, 'argv', ['train'] + argv)
    cli_train.main()
    return calls, init


@pytest.fixture
def tiny_config(tmp_path):
    cfg = tmp_path / 'config.yaml'
    cfg.write_text(
        'model:\n  algo: InstaOrderNet_o\n  total_iter: 1\n'
        '  lr: 0.001\n  lr_steps: [1]\n  lr_mults: [0.1]\n  optim: SGD\n'
        'data:\n  dataset: InstaOrder\n  batch_size: 2\n'
        'trainer:\n  exp_name: t\n')
    return str(cfg)


def test_multihost_flag_initializes_distributed(tiny_config, monkeypatch):
    """--multihost is the reference's torch.distributed/NCCL launcher
    analogue (main.py:35 dist_init) — it must call
    jax.distributed.initialize() before building the Trainer."""
    calls, init = _run_cli(['--config', tiny_config, '--multihost'],
                           monkeypatch)
    init.assert_called_once_with()
    assert calls['validate_only'] is False


def test_default_does_not_initialize_distributed(tiny_config, monkeypatch):
    calls, init = _run_cli(['--config', tiny_config], monkeypatch)
    init.assert_not_called()


def test_parity_flags_and_validate(tiny_config, monkeypatch):
    calls, _ = _run_cli(
        ['--config', tiny_config, '--validate', '--extract',
         '--evaluate', '--evaluate-save', '--seed', '7'], monkeypatch)
    assert calls['validate_only'] is True
    assert calls['cfg'].seed == 7


def test_load_pretrain_plumbs_into_config(tiny_config, monkeypatch):
    calls, _ = _run_cli(
        ['--config', tiny_config, '--load_pretrain', '/x/imagenet.pth'],
        monkeypatch)
    assert calls['cfg'].load_pretrain == '/x/imagenet.pth'


def test_load_iter_path_join(tiny_config, monkeypatch):
    calls, _ = _run_cli(
        ['--config', tiny_config, '--load-model', '/ck', '--load-iter',
         '500', '--resume'], monkeypatch)
    assert calls['load'] == ('/ck/ckpt_iter_500.ckpt', True)


def test_auto_resume_finds_latest(tiny_config, monkeypatch, tmp_path):
    """--auto-resume: elastic relaunch resumes from the newest checkpoint
    in the run dir without a path argument."""
    out = tmp_path / 'run'
    ck = out / 'checkpoints'
    ck.mkdir(parents=True)
    (ck / 'ckpt_iter_2.ckpt').write_bytes(b'x')
    (ck / 'ckpt_iter_10.ckpt').write_bytes(b'x')
    calls, _ = _run_cli(['--config', tiny_config, '--auto-resume',
                         '--out-dir', str(out)], monkeypatch)
    assert calls['load'] == (str(ck / 'ckpt_iter_10.ckpt'), True)


def test_auto_resume_fresh_run_no_load(tiny_config, monkeypatch, tmp_path):
    out = tmp_path / 'fresh'
    calls, _ = _run_cli(['--config', tiny_config, '--auto-resume',
                         '--out-dir', str(out)], monkeypatch)
    assert 'load' not in calls
