"""dp x tp x sp sharding: full train step on a (2, 2, 2) virtual mesh.

Channel (tensor) parallelism + depth (spatial) partitioning via GSPMD
PartitionSpecs (parallel/tp.py) must produce the same training step as a
single device — XLA inserts the psums/halo exchanges. Runs on the 8-device
CPU mesh from conftest.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.models import AnatCNN
from multimodal_alzheimer_tpu.parallel.tp import (
    MODEL_AXIS,
    batch_spec,
    make_mesh_3d,
    param_spec,
    shard_batch_3d,
    shard_state,
)
from multimodal_alzheimer_tpu.train import (
    TrainState,
    make_train_step,
    single_lr_optimizer,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(seed=0, optimizer=None):
    model = AnatCNN.from_hparams({"n_classes": 3, "resnet_depth": 10,
                                  "linear_out": ()})
    criterion = make_criterion({"loss_class_weights": [0.4, 0.3, 0.3]})
    if optimizer is None:
        optimizer = single_lr_optimizer(1e-3)
    rng = np.random.default_rng(seed)
    batch = {
        "mri": jnp.asarray(rng.normal(size=(4, 16, 18, 16))
                           .astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 3, 4), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, criterion, optimizer)
    return step, state, batch


def test_param_spec_rules():
    n = 2
    assert param_spec((), jnp.zeros((3, 3, 3, 64, 128)), n) == \
        P(None, None, None, None, MODEL_AXIS)
    assert param_spec((), jnp.zeros((512, 3)), n) == P(MODEL_AXIS, None)
    assert param_spec((), jnp.zeros((64,)), n) == P(MODEL_AXIS)
    assert param_spec((), jnp.zeros((3,)), n) == P()       # indivisible
    assert param_spec((), jnp.zeros(()), n) == P()         # scalar
    assert batch_spec("mri", jnp.zeros((4, 8, 8, 8))) == \
        P("data", "spatial")
    assert batch_spec("label", jnp.zeros((4,))) == P("data")


def test_three_axis_step_matches_single_device():
    # SGD: updates are linear in the gradients, so the sharded step must
    # match up to reduction-order float noise (Adam's m/sqrt(v)
    # normalization amplifies that noise on near-zero gradients — the
    # same split as tests/test_parallel.py: SGD exact-ish, Adam
    # functional via the other tests here).
    sgd = optax.sgd(1e-2)
    step, state, batch = _setup(optimizer=sgd)

    # single-device reference (donates state -> rebuild for the 2nd run)
    s_ref, aux_ref = step(state, batch, jax.random.PRNGKey(1))
    _, state2, _ = _setup(optimizer=sgd)

    mesh = make_mesh_3d(2, 2, 2)
    s_sharded = shard_state(state2, mesh)
    b_sharded = shard_batch_3d(batch, mesh)
    s_out, aux = step(s_sharded, b_sharded, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(aux["loss"]), float(aux_ref["loss"]),
                               rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        s_out.params, s_ref.params)
    # BN running stats also match (global-batch reduction under GSPMD)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5),
        s_out.batch_stats, s_ref.batch_stats)


def test_params_are_actually_sharded():
    _, state, _ = _setup()
    mesh = make_mesh_3d(2, 2, 2)
    s = shard_state(state, mesh)
    k = s.params["backbone"]["layer1_block0"]["conv1"]["kernel"]
    spec = k.sharding.spec
    assert spec == P(None, None, None, None, MODEL_AXIS)
    # a shard holds half the output channels
    db = k.addressable_shards[0].data
    assert db.shape[-1] == k.shape[-1] // 2


def test_second_step_keeps_shardings():
    """Donated/jitted steps must not silently gather params."""
    step, state, batch = _setup()
    mesh = make_mesh_3d(2, 2, 2)
    s = shard_state(state, mesh)
    b = shard_batch_3d(batch, mesh)
    s, _ = step(s, b, jax.random.PRNGKey(1))
    s, aux = step(s, b, jax.random.PRNGKey(2))
    assert np.isfinite(float(aux["loss"]))
    k = s.params["backbone"]["layer1_block0"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, None, MODEL_AXIS)
