"""Data parallelism over the 8-device CPU mesh: DP == single-device."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.models import SmallPETCNN
from multimodal_alzheimer_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)
from multimodal_alzheimer_tpu.train import (
    TrainState,
    make_train_step,
    single_lr_optimizer,
)

HP = {"n_classes": 3, "conv_out": (4, 8), "filter_size": (3, 3),
      "linear_out": 16, "batchnorm": True, "lr": 1e-3}


def _batch(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return {"pet1451": jnp.asarray(
                rng.normal(size=(n, 16, 16, 16)).astype(np.float32)),
            "label": jnp.asarray(rng.integers(0, 3, n), jnp.int32)}


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices


def test_dp_matches_single_device():
    """Same step on replicated params + sharded batch must equal the
    single-device result (XLA inserts the gradient all-reduce; BatchNorm
    reduces over the GLOBAL batch under GSPMD).

    Parity is asserted with SGD: updates are linear in the gradients, so
    shard-order float noise (~1e-7) stays ~1e-7. (Adam's g/sqrt(g^2)
    normalization amplifies that noise to +-lr on near-zero components —
    the same nondeterminism torch DDP exhibits — so Adam gets a
    functional check in test_dp_adam_trains instead.)"""
    import optax

    model = SmallPETCNN.from_hparams(HP)
    criterion = make_criterion({"loss_class_weights": [0.5, 0.3, 0.2]})
    optimizer = optax.sgd(1e-2)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    step = make_train_step(model, criterion, optimizer)

    # single device (deep-copy: the donated steps consume their buffers)
    copy = lambda tree: jax.tree_util.tree_map(jnp.array, tree)
    state1 = TrainState.create(copy(variables), optimizer)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        state1, aux1 = step(state1, batch, rng)

    # 8-device DP
    mesh = make_mesh()
    state8 = TrainState.create(copy(variables), optimizer)
    state8 = replicate(state8, mesh)
    sharded = shard_batch(batch, mesh)
    for i in range(3):
        state8, aux8 = step(state8, sharded, rng)

    np.testing.assert_allclose(float(aux1["loss"]), float(aux8["loss"]),
                               rtol=1e-5)
    a = jax.tree_util.tree_leaves(state1.params)
    b = jax.tree_util.tree_leaves(state8.params)
    for la, lb in zip(a, b):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=1e-5)
    # batch stats also synced across shards
    for la, lb in zip(jax.tree_util.tree_leaves(state1.batch_stats),
                      jax.tree_util.tree_leaves(state8.batch_stats)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=2e-4, atol=1e-5)


def test_dp_adam_trains():
    """Adam + DP: loss decreases and losses stay in lockstep with the
    single-device run at each step (params may drift by +-lr on tiny
    gradient components; see test_dp_matches_single_device)."""
    model = SmallPETCNN.from_hparams(HP)
    criterion = make_criterion({"loss_class_weights": None})
    optimizer = single_lr_optimizer(HP["lr"])
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    step = make_train_step(model, criterion, optimizer)
    mesh = make_mesh()
    state = replicate(TrainState.create(variables, optimizer), mesh)
    sharded = shard_batch(batch, mesh)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(10):
        state, aux = step(state, sharded, rng)
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0]


def test_batch_sharding_layout():
    mesh = make_mesh()
    batch = _batch()
    sharded = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sharded["pet1451"].addressable_shards]
    assert all(s == (2, 16, 16, 16) for s in shard_shapes)
    assert batch_sharding(mesh).is_fully_replicated is False
