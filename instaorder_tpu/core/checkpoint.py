"""Checkpoint I/O.

Parity with the reference's `{step, state_dict, optimizer}` pickles named
`ckpt_iter_{N}.pth.tar` (models/single_stage_model.py:66-72,
utils/common_utils.py:128-149): we save `{step, params, stats, opt_state}`
as msgpack (flax.serialization) named `ckpt_iter_{N}.ckpt`, resume-iter
parse from the filename included. Loading is lenient like the reference's
strict=False: missing keys keep their initialized values, with warnings.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_state(folder: str, step: int, params, stats, opt_state=None):
    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, f'ckpt_iter_{step}.ckpt')
    blob = {'step': step,
            'params': jax.tree_util.tree_map(np.asarray, params),
            'stats': jax.tree_util.tree_map(np.asarray, stats)}
    if opt_state is not None:
        blob['opt_state'] = jax.tree_util.tree_map(np.asarray, opt_state)
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(blob))
    return path


def _lenient_merge(target, loaded, path='', warn=print):
    """Take loaded values where the tree structure matches; keep target
    leaves (with a warning) where it doesn't — reference's strict=False."""
    if isinstance(target, dict):
        if not isinstance(loaded, dict):
            warn(f'caution: checkpoint missing subtree {path}')
            return target
        out = {}
        for k, v in target.items():
            if k in loaded:
                out[k] = _lenient_merge(v, loaded[k], f'{path}.{k}', warn)
            else:
                warn(f'caution: missing key from checkpoint: {path}.{k}')
                out[k] = v
        return out
    if isinstance(target, (list, tuple)):
        if not isinstance(loaded, (list, tuple)) or \
                len(loaded) != len(target):
            warn(f'caution: checkpoint list mismatch at {path}')
            return target
        merged = [
            _lenient_merge(t, l, f'{path}[{i}]', warn)
            for i, (t, l) in enumerate(zip(target, loaded))]
        return type(target)(merged) if isinstance(target, tuple) else merged
    # leaf
    if loaded is None:
        return target
    if hasattr(target, 'shape') and hasattr(loaded, 'shape') and \
            tuple(target.shape) != tuple(loaded.shape):
        warn(f'caution: shape mismatch at {path}: '
             f'{tuple(loaded.shape)} vs {tuple(target.shape)}')
        return target
    return loaded


def load_state(path: str, params, stats, opt_state=None, warn=print):
    """Returns (step, params, stats, opt_state)."""
    if not os.path.isfile(path):
        raise FileNotFoundError(f"=> no checkpoint found at '{path}'")
    with open(path, 'rb') as f:
        blob = serialization.msgpack_restore(f.read())
    step = int(blob.get('step', parse_iter(path) or 0))
    params = _lenient_merge(params, blob.get('params', {}), 'params', warn)
    stats = _lenient_merge(stats, blob.get('stats', {}), 'stats', warn)
    if opt_state is not None and 'opt_state' in blob:
        opt_state = _lenient_merge(opt_state, blob['opt_state'],
                                   'opt_state', warn)
    return step, params, stats, opt_state


def parse_iter(path: str) -> Optional[int]:
    """Resume iteration parsed from the filename, trainer.py:89."""
    m = re.search(r'iter_(\d+)', os.path.basename(path))
    return int(m.group(1)) if m else None


def latest_checkpoint(folder: str) -> Optional[str]:
    if not os.path.isdir(folder):
        return None
    best, best_it = None, -1
    for fn in os.listdir(folder):
        it = parse_iter(fn)
        if it is not None and it > best_it:
            best, best_it = os.path.join(folder, fn), it
    return best
