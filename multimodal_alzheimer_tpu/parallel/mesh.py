"""Device mesh + sharding helpers (the framework's parallelism layer).

The reference is strictly single-GPU (``accelerator='gpu', devices=1``
everywhere — reference: train_pet_cnn.py:182-183; SURVEY.md §2.6). Here
scaling is first-class: a 1-D ``jax.sharding.Mesh`` over all chips with
batch data parallelism via GSPMD — parameters replicated, batches sharded
on the 'data' axis, gradient all-reduce inserted by XLA over ICI. No
NCCL-style explicit communication; the same jitted train step runs on 1
chip or N chips depending only on input shardings.

Volumes are 91x109x91 (far below TP/PP scale), so DP is the designed axis
of scale, matching SURVEY.md §2.6's capability envelope.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    import numpy as np

    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))


def shard_batch(batch: dict, mesh: Mesh):
    """Place a host batch dict sharded along the batch axis."""
    return jax.device_put(batch, batch_sharding(mesh))
