"""Device mesh utilities: the TPU-native replacement for NCCL DDP.

The reference scales with one NCCL process per GPU and gradient
all-reduce inside DDP (/root/reference/src/daft_exprt/train.py:246-293,
hparams.py:62). Here parallelism is SPMD over a JAX mesh: a 1-D 'data'
axis shards the batch; gradients psum over ICI as part of the compiled
train step (no explicit barriers -- SPMD lockstep).

Multi-host: call ``initialize_distributed`` once per host before device
use; each host feeds its local shard via
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host rendezvous over DCN (replaces the reference's TCP store
    at tcp://localhost:54321, train.py:498).

    Pass ``"auto"`` on Cloud TPU runtimes whose environment metadata
    lets JAX discover the coordinator itself.
    """
    if coordinator_address == "auto":
        jax.distributed.initialize()
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(dp_size: int = -1, devices=None) -> Mesh:
    """1-D data-parallel mesh. dp_size -1 = all visible devices."""
    if devices is None:
        devices = jax.devices()
    if dp_size == -1:
        dp_size = len(devices)
    assert dp_size <= len(devices), (dp_size, len(devices))
    return Mesh(np.asarray(devices[:dp_size]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard the (micro-)batch axis over the data mesh axis."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, batch_axis: int = 0):
    """Place a host batch pytree onto the mesh, sharded on batch_axis.

    Single-process: a plain sharded device_put of the global batch.
    Multi-host: each process passes its LOCAL rows (the loaders emit
    per-process slices) and the global array is assembled with
    ``jax.make_array_from_process_local_data`` — device_put cannot
    target non-addressable devices.
    """
    sharding = batch_sharding(mesh, batch_axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    n_proc = jax.process_count()

    def put(x):
        global_shape = list(np.shape(x))
        global_shape[batch_axis] *= n_proc
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), tuple(global_shape))

    return jax.tree.map(put, batch)
