"""Shared-tower evaluation of the frozen stage-3 fusion.

The reference's All_Modalities_Fusion holds two private copies of each
stage-1 tower (pkg/models/fusion_models/all_modalities_fusion.py:66-79) and
runs both every step; in the default frozen regime the copies hold
identical grafted weights and see identical inputs, so the duplicate
forwards are pure waste. ``share_towers`` runs each tower once and feeds
every consumer — these tests prove it is a pure evaluation-strategy change:
bit-identical logits, bit-identical training trajectories (after mirroring
BN stats to the never-visited duplicates), and a strictly smaller forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion import (
    AllModalitiesFusion,
)
from multimodal_alzheimer_tpu.train import TrainState, make_train_step
from multimodal_alzheimer_tpu.train.checkpoint import (
    assert_tower_duplicates_equal,
    sync_tower_duplicates,
)
from multimodal_alzheimer_tpu.train.driver import fusion_optimizer

PET_HP = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
          "linear_out": 8}
MRI_HP = {"n_classes": 3, "resnet_depth": 10}
TAB_HP = {"n_classes": 3, "hidden": (16, 32)}
HP3 = {"n_classes": 3, "lr": 1e-3, "lr_pretrained": None}
HP2 = {"n_classes": 3}  # no lr_pretrained -> stage-1 towers frozen


def _batch(n=2, s=16):
    rng = np.random.default_rng(0)
    return {
        "pet1451": jnp.asarray(rng.normal(size=(n, s, s, s))
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(size=(n, s, s, s)).astype(np.float32)),
        "tabular": jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 3, n), jnp.int32),
    }


def _models():
    shared = AllModalitiesFusion.from_hparams(
        HP3, HP2, HP2, HP2, PET_HP, MRI_HP, TAB_HP)
    unshared = AllModalitiesFusion.from_hparams(
        HP3, HP2, HP2, HP2, PET_HP, MRI_HP, TAB_HP, share_towers=False)
    return shared, unshared


def _synced_variables(model, batch):
    """Init (duplicate towers get independent random init) then emulate the
    frozen grafting regime, which loads the same stage-1 checkpoint into
    both copies (train_all_modalities_fusion.py:88-95)."""
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return sync_tower_duplicates(variables)


def test_share_derives_from_frozen_regime():
    shared, _ = _models()
    assert shared.freeze_towers and shared.share_towers
    # any stage-2 sub-model training its towers forbids sharing
    m = AllModalitiesFusion.from_hparams(
        HP3, {"n_classes": 3, "lr_pretrained": 1e-6}, HP2, HP2,
        PET_HP, MRI_HP, TAB_HP)
    assert not m.share_towers


def test_shared_logits_bit_identical():
    batch = _batch()
    shared, unshared = _models()
    variables = _synced_variables(unshared, batch)
    out_s = shared.apply(variables, batch, train=False)
    out_u = unshared.apply(variables, batch, train=False)
    np.testing.assert_array_equal(np.asarray(out_s["logits"]),
                                  np.asarray(out_u["logits"]))
    np.testing.assert_array_equal(
        np.asarray(out_s["embeddings"]["fusion"]),
        np.asarray(out_u["embeddings"]["fusion"]))


def test_shared_forward_is_actually_smaller():
    """The shared graph must drop the duplicate tower forwards."""
    batch = _batch()
    shared, unshared = _models()
    variables = _synced_variables(unshared, batch)

    def n_convs(model):
        jaxpr = jax.make_jaxpr(
            lambda v, b: model.apply(v, b, train=False))(variables, batch)
        return str(jaxpr).count("conv_general_dilated")

    # unshared runs pet/mri CNN towers twice each; shared runs them once
    assert n_convs(shared) < n_convs(unshared)


def test_shared_training_trajectory_bit_identical():
    """3 optimizer steps shared vs unshared from the same grafted start:
    identical params; identical batch_stats once the shared run's stats
    are mirrored to the duplicates (exactly what Trainer does at
    checkpoint-save time)."""
    batch = _batch()
    shared, unshared = _models()
    variables = _synced_variables(unshared, batch)
    criterion = make_criterion({"loss_class_weights": None})

    def run(model):
        optimizer = fusion_optimizer(HP3, ("stage3out", "cls3"))
        # per-run buffer copies: the jitted step donates its state, which
        # would delete the shared `variables` arrays for the second run
        state = TrainState.create(
            jax.tree.map(jnp.array, variables), optimizer)
        step = make_train_step(model, criterion, optimizer)
        for _ in range(3):
            state, aux = step(state, batch, jax.random.PRNGKey(1))
        return state, float(aux["loss"])

    s_shared, loss_shared = run(shared)
    s_unshared, loss_unshared = run(unshared)
    assert loss_shared == loss_unshared
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        s_shared.params, s_unshared.params)
    # the unshared run updates both copies' BN stats identically; the
    # shared run only visits the canonical copies — after mirroring, the
    # full stat trees agree bit-for-bit
    stats_synced = sync_tower_duplicates(
        {"batch_stats": s_shared.batch_stats})["batch_stats"]
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        stats_synced, s_unshared.batch_stats)


def test_share_rejects_unfrozen_submodel():
    batch = _batch()
    model = AllModalitiesFusion.from_hparams(
        HP3, {"n_classes": 3, "lr_pretrained": 1e-6}, HP2, HP2,
        PET_HP, MRI_HP, TAB_HP, share_towers=True)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    with pytest.raises(ValueError, match="share_towers"):
        model.apply(variables, batch, train=False)


def test_sync_and_assert_helpers():
    batch = _batch()
    _, unshared = _models()
    variables = unshared.init(jax.random.PRNGKey(0), batch, train=False)
    # independent random init: duplicates differ from canonicals
    with pytest.raises(ValueError, match="duplicate mismatch"):
        assert_tower_duplicates_equal(variables)
    synced = sync_tower_duplicates(variables)
    assert_tower_duplicates_equal(synced)  # no raise
    # non-stage-3 trees pass through untouched
    assert_tower_duplicates_equal({"params": {"dense": {"kernel": 0}}})
