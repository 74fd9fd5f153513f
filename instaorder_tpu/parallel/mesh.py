"""Device mesh + sharding helpers.

The reference's only parallelism is hand-rolled data parallelism over NCCL
(utils/distributed_utils.py:13-37: param broadcast at init + per-parameter
grad all_reduce after backward). The TPU-native equivalent is declarative:

  * a 1-D `data` mesh over ICI (extendable to ('replica', 'data') over
    DCN x ICI for multi-host),
  * batches sharded on axis 0, params/stats replicated,
  * gradient sync expressed as `lax.pmean` inside the shard_map'd train
    step — XLA lowers it to an ICI all-reduce, overlapped with compute.

No process groups, no explicit broadcasts: replicated sharding of the
param pytree subsumes DistModule.broadcast_params.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh. Defaults to all local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f'requested a {n_devices}-device mesh but only '
                f'{len(devices)} devices are available '
                f'({[d.platform for d in devices]}); a silently truncated '
                f'mesh would fake multi-chip coverage')
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch pytree with axis-0 sharded over the data axis."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), batch)
