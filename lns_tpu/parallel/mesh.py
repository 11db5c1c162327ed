"""1-D data-parallel mesh + sharding helpers.

Usage pattern (the whole DP story — XLA inserts the collectives):

    mesh = data_mesh()
    step = jax.jit(train_step,
                   in_shardings=(replicated_sharding(mesh),  # params
                                 replicated_sharding(mesh),  # opt state
                                 batch_sharding(mesh)),      # batch
                   out_shardings=...,
                   donate_argnums=(0, 1))

Gradients are averaged across devices automatically because the loss is a
mean over the sharded batch axis: XLA lowers the reduction to a psum over
ICI. Per-host data sharding: each host feeds only its addressable shard via
`shard_batch`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Device-put a host numpy batch with its leading axis sharded."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def make_global_batch(mesh: Mesh, local_batch, axis_name: str = "data"):
    """Multi-host assembly: each host contributes its process-local shard of
    the global batch (per-host sharded data loading, SURVEY section 5 comm
    backend row). On a single-host mesh this degrades to `shard_batch`."""
    import jax

    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), local_batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, x), local_batch
    )


def pad_to_multiple(batch, multiple: int):
    """Pad the leading axis of every array to a multiple of the mesh size so
    shardings stay valid on ragged final batches; returns (padded, n_valid)."""
    import numpy as np

    def pad(x):
        n = x.shape[0]
        rem = (-n) % multiple
        if rem == 0:
            return x
        return np.concatenate([x, np.repeat(x[-1:], rem, axis=0)], axis=0)

    n_valid = jax.tree.leaves(batch)[0].shape[0]
    return jax.tree.map(pad, batch), n_valid
