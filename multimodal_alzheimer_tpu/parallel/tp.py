"""Tensor + spatial parallelism over a (data, model, spatial) device mesh.

``parallel/mesh.py`` gives pure data parallelism (replicated params,
batch-sharded inputs) — the designed axis of scale for ADNI-sized volumes.
This module adds the GSPMD shardings that carry the same models past a
single chip's memory/FLOP envelope:

  * **tp ('model' axis)** — channel parallelism: every backbone conv
    kernel is sharded on its output-channel dim, BatchNorm parameters and
    running stats on their (per-channel) dim, and each head dense kernel
    on its input-feature dim. XLA propagates the shardings: activations
    flow channel-sharded through the network and the head contraction
    emits one psum over 'model' — the standard Megatron-style column/row
    split, expressed purely as PartitionSpecs (no hand collectives).
  * **sp ('spatial' axis)** — spatial partitioning: volumes are sharded
    along the depth axis; XLA inserts halo exchanges for the windowed ops
    (convs / pooling) automatically. This is the axis that scales to
    volumes that do not fit one chip's HBM at all.
  * **dp ('data' axis)** — unchanged batch sharding.

pp/ep are deliberately out of scope: the model family is shallow CNN
classifiers — there are no pipeline-depth or expert-routing dimensions to
shard (PARITY.md records the scoping).

Sharding rules are *shape-driven* (see ``param_spec``): 5-D conv kernels
shard on O, 2-D dense kernels on the input dim, 1-D per-channel vectors on
their only dim — each only when divisible by the model-axis size, else
replicated. This covers every architecture in ``models/`` without
per-model tables; anything unrecognized stays replicated (always correct,
GSPMD reshards as needed).

No reference counterpart: the reference is strictly single-GPU
(train_pet_cnn.py:182-183 ``accelerator='gpu', devices=1``); SURVEY.md
§2.6 names multi-chip scaling as this rebuild's flagship capability.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SPATIAL_AXIS = "spatial"


def make_mesh_3d(n_data: int, n_model: int, n_spatial: int = 1,
                 devices=None) -> Mesh:
    """(data, model, spatial) mesh over the first n_d*n_m*n_s devices."""
    if devices is None:
        devices = jax.devices()
    n = n_data * n_model * n_spatial
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_model, n_spatial)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS))


def param_spec(path: tuple, leaf, n_model: int) -> P:
    """Shape-driven PartitionSpec for one parameter/stat leaf.

    path is the flattened key-path (used only for documentation/debug);
    the decision is by rank and divisibility:
      * rank 5 (conv DHWIO): shard O           -> P(..., 'model')
      * rank 2 (dense in,out): shard the input -> P('model', None)
        (row-split: the matmul contracts the sharded dim -> one psum)
      * rank 1 (BN scale/bias/stats, biases): shard if divisible
      * otherwise replicated
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) == 5 and shape[-1] % n_model == 0:
        return P(None, None, None, None, MODEL_AXIS)
    if len(shape) == 2 and shape[0] % n_model == 0:
        return P(MODEL_AXIS, None)
    if len(shape) == 1 and shape[0] % n_model == 0:
        return P(MODEL_AXIS)
    return P()


def variable_shardings(variables, mesh: Mesh):
    """NamedSharding pytree for a flax variables dict (params+stats)."""
    n_model = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        return NamedSharding(mesh, param_spec(path, leaf, n_model))

    return jax.tree_util.tree_map_with_path(one, variables)


def shard_variables(variables, mesh: Mesh):
    """Place a variables dict sharded per ``param_spec``."""
    return jax.device_put(variables, variable_shardings(variables, mesh))


def shard_state(state, mesh: Mesh):
    """Shard a TrainState: params/stats/opt-state per-spec, scalars repl.

    Optimizer state entries mirror parameter shapes (Adam m/v), so the
    same shape rule applies; true scalars (step counts) replicate.
    """
    n_model = mesh.shape[MODEL_AXIS]

    def one(path, leaf):
        return jax.device_put(
            leaf, NamedSharding(mesh, param_spec(path, leaf, n_model)))

    return jax.tree_util.tree_map_with_path(one, state)


def batch_spec(key: str, leaf) -> P:
    """Inputs: batch on 'data'; volumes additionally depth-on-'spatial'."""
    ndim = getattr(leaf, "ndim", 0)
    if ndim >= 4:  # (B, D, H, W[, C]) volume
        return P(DATA_AXIS, SPATIAL_AXIS)
    if ndim >= 1:
        return P(DATA_AXIS)
    return P()


def shard_batch_3d(batch: dict, mesh: Mesh):
    return {
        k: jax.device_put(v, NamedSharding(mesh, batch_spec(k, v)))
        for k, v in batch.items()
    }
