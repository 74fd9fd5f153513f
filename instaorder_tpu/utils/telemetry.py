"""Training/eval telemetry — the reference's wandb / tensorboardX hooks
(trainer.py:39-66, 185-198, 249-257; tools/test.py:97-103, 270-286)
behind one config-gated facade.

wandb is not installed in this environment; requesting `wandb: True`
raises with the same switch-it-off guidance the reference gives for a
missing tensorboardX (trainer.py:60-65). tensorboardX IS available and is
the supported sink.
"""

from __future__ import annotations

import os
from typing import Optional


class SummaryLogger:
    """Facade over tensorboardX SummaryWriter (+ wandb when importable).

    scalar(tag, value, step) mirrors the reference's tag conventions:
    'lr', 'train_<k>', 'val_<k>' for the Trainer (trainer.py:186-193,
    249-252) and 'val/<k>' style for the Tester (tools/test.py:276-286).
    """

    def __init__(self, tb_writer=None, wb_run=None):
        self._tb = tb_writer
        self._wb = wb_run

    @property
    def active(self) -> bool:
        return self._tb is not None or self._wb is not None

    def scalar(self, tag: str, value, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)
        if self._wb is not None:
            self._wb.log({tag: float(value)}, step=step)

    def scalars(self, tags_values: dict, step: int):
        for k, v in tags_values.items():
            self.scalar(k, v, step)

    def flush(self):
        if self._tb is not None:
            # tensorboardX's flush() writes the FILE but does not drain
            # the async event queue (EventFileWriter._event_queue is
            # consumed by a worker thread) — scalars added just before
            # flush() can still be in flight. Drain it first so flush()
            # means "everything scalar()'d so far is on disk".
            import time
            writers = getattr(self._tb, 'all_writers', None) or {}
            for w in writers.values():
                q = getattr(getattr(w, 'event_writer', None),
                            '_event_queue', None)
                if q is None:
                    continue
                deadline = time.time() + 5.0
                while not q.empty() and time.time() < deadline:
                    time.sleep(0.01)
                # the worker may have popped the last event but not yet
                # handed it to the file writer; give it a beat
                time.sleep(0.05)
            self._tb.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
            self._tb = None
        if self._wb is not None:
            self._wb.finish()
            self._wb = None


def make_summary_logger(trainer_cfg: dict, folder: str,
                        run_name: Optional[str] = None,
                        config=None) -> SummaryLogger:
    """Config-gated construction, matching reference trainer.py:54-66:
    `wandb: True` wins over `tensorboard: True`; events go to
    <folder>/events."""
    tb_writer = None
    wb_run = None
    if trainer_cfg.get('wandb'):
        try:
            import wandb
        except ImportError as e:
            raise RuntimeError(
                'wandb is not installed in this environment; switch off '
                '"wandb" in your config (use "tensorboard: True" instead)'
            ) from e
        wb_run = wandb.init(project='InstaOrder', name=run_name,
                            config=config)
    elif trainer_cfg.get('tensorboard'):
        try:
            from tensorboardX import SummaryWriter
        except ImportError as e:
            raise RuntimeError(
                'Please switch off "tensorboard" in your config file if '
                'you do not want to use it, otherwise install it.') from e
        tb_writer = SummaryWriter(os.path.join(folder, 'events'))
    return SummaryLogger(tb_writer, wb_run)
