"""Host-side gather utilities over the mesh.

Parity with the reference's shape-padded gathers
(utils/distributed_utils.py:89-136: gather_tensors / gather_tensors_batch
— all_gather of variable-shape numpy arrays for feature extraction). On
the single-controller TPU model, per-shard arrays are already addressable,
so these reduce to fetching addressable shards; the multi-host path uses
jax.experimental.multihost_utils.process_allgather.
"""

from __future__ import annotations

import numpy as np
import jax


def gather_tensors(array):
    """Gather a device array's shards to host -> list of numpy arrays
    (one per shard; replicated arrays return a single copy)."""
    if not hasattr(array, 'addressable_shards'):
        return [np.asarray(array)]
    shards = array.addressable_shards
    seen = set()
    out = []
    for s in shards:
        key = tuple((sl.start, sl.stop) if isinstance(sl, slice) else sl
                    for sl in (s.index or ()))
        if key in seen:
            continue
        seen.add(key)
        out.append(np.asarray(s.data))
    return out


def gather_tensors_batch(array, part_size=None):
    """Concatenated gather (reference gather_tensors_batch semantics:
    chunked all_gather then concat)."""
    return np.concatenate(gather_tensors(array), axis=0)


def process_allgather(x):
    """Multi-host allgather of per-process data (replaces the reference's
    padded dist.all_gather); no-op passthrough on a single process."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(x)
