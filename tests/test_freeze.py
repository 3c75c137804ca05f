"""Frozen-tower stop_gradient semantics (torch requires_grad=False parity).

The reference freezes pretrained submodules by setting requires_grad=False
(anat_pet_fusion.py:34-40, anat_cnn.py:111-126), which in torch *skips the
backward through them entirely*. Here freezing is the ``freeze_towers`` /
``freeze_backbone`` model flags (derived from ``lr_pretrained`` exactly as
the optimizer groups in train/driver.py:fusion_optimizer are): gradient
values and parameter updates are bit-identical to optimizer-side masking
(both exactly zero), but the tower dgrad/wgrad work is never emitted.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multimodal_alzheimer_tpu.losses import make_criterion
from multimodal_alzheimer_tpu.models import AnatCNN, AnatPETFusion
from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion import (
    AllModalitiesFusion,
)

PET_HP = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
          "linear_out": 8}
MRI_HP = {"n_classes": 3, "resnet_depth": 10}
TAB_HP = {"n_classes": 3, "hidden": (16, 32)}


def _batch(n=2, s=16):
    rng = np.random.default_rng(0)
    return {
        "pet1451": jnp.asarray(rng.normal(size=(n, s, s, s))
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(size=(n, s, s, s)).astype(np.float32)),
        "tabular": jnp.asarray(rng.normal(size=(n, 9)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 3, n), jnp.int32),
    }


def _grads(model, batch):
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    criterion = make_criterion({"loss_class_weights": None})

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch, train=True, mutable=["batch_stats"])
        return criterion(out["logits"], batch["label"])

    return variables, jax.grad(loss_fn)(variables["params"])


def test_fusion_freeze_derived_from_lr_pretrained():
    frozen = AnatPETFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": None}, PET_HP, MRI_HP)
    assert frozen.freeze_towers
    unfrozen = AnatPETFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": 1e-6}, PET_HP, MRI_HP)
    assert not unfrozen.freeze_towers
    # absent key (ad-hoc/bench construction): fully differentiable
    default = AnatPETFusion.from_hparams({"n_classes": 3}, PET_HP, MRI_HP)
    assert not default.freeze_towers
    # towers never freeze themselves inside a fusion
    assert not frozen.mri_model.freeze_backbone


def test_frozen_tower_grads_zero_head_grads_identical():
    batch = _batch()
    frozen = AnatPETFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": None}, PET_HP, MRI_HP)
    unfrozen = AnatPETFusion.from_hparams({"n_classes": 3}, PET_HP, MRI_HP)

    _, g_frozen = _grads(frozen, batch)
    _, g_unfrozen = _grads(unfrozen, batch)

    for tower in ("pet_model", "mri_model"):
        leaves = jax.tree.leaves(g_frozen[tower])
        assert leaves and all(not np.asarray(l).any() for l in leaves)
        # unfrozen gradients through the towers are genuinely nonzero
        assert any(np.asarray(l).any()
                   for l in jax.tree.leaves(g_unfrozen[tower]))
    # head gradients do not route through the towers: bit-identical
    for name in ("reduce_dim_mri", "stage2out", "cls2"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            g_frozen[name], g_unfrozen[name])


def test_frozen_updates_match_optimizer_masking():
    """stop_gradient freezing == set_to_zero masking, step for step."""
    from multimodal_alzheimer_tpu.train import TrainState, make_train_step
    from multimodal_alzheimer_tpu.train.driver import fusion_optimizer

    batch = _batch()
    hp = {"n_classes": 3, "lr": 1e-3, "lr_pretrained": None}
    head_names = ("reduce_dim_mri", "stage2out", "cls2")
    criterion = make_criterion({"loss_class_weights": None})

    def run(model):
        optimizer = fusion_optimizer(hp, head_names)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        state = TrainState.create(variables, optimizer)
        step = make_train_step(model, criterion, optimizer)
        for _ in range(3):
            state, _ = step(state, batch, jax.random.PRNGKey(1))
        return state

    s_stop = run(AnatPETFusion.from_hparams(hp, PET_HP, MRI_HP))
    s_mask = run(AnatPETFusion.from_hparams(hp, PET_HP, MRI_HP,
                                            freeze_towers=False))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=0),
        s_stop.params, s_mask.params)
    # BN batch_stats in the frozen towers still updated (train-mode parity)
    init_stats = AnatPETFusion.from_hparams(hp, PET_HP, MRI_HP).init(
        jax.random.PRNGKey(0), batch, train=False)["batch_stats"]
    changed = jax.tree.map(
        lambda a, b: bool(np.any(np.asarray(a) != np.asarray(b))),
        s_stop.batch_stats["mri_model"], init_stats["mri_model"])
    assert any(jax.tree.leaves(changed))


def test_backbone_freeze_standalone_model():
    batch = _batch()
    hp = dict(MRI_HP, lr_pretrained=None)
    model = AnatCNN.from_hparams(hp)
    assert model.freeze_backbone
    _, g = _grads(model, batch)
    assert all(not np.asarray(l).any()
               for l in jax.tree.leaves(g["backbone"]))
    assert any(np.asarray(l).any() for l in jax.tree.leaves(g["head"]))
    # explicit override wins
    assert not AnatCNN.from_hparams(hp, freeze_backbone=False).freeze_backbone


def test_stage3_freeze_covers_all_submodels():
    batch = _batch()
    hp3 = {"n_classes": 3, "lr_pretrained": None}
    model = AllModalitiesFusion.from_hparams(
        hp3, {"n_classes": 3, "lr_pretrained": 1e-6}, {"n_classes": 3},
        {"n_classes": 3}, PET_HP, MRI_HP, TAB_HP)
    assert model.freeze_towers
    # stage-1 tower freezing derives from each stage-2 checkpoint's own
    # saved lr_pretrained (reference load_from_checkpoint re-runs the
    # stage-2 __init__ with its hparams, anat_pet_fusion.py:34-40)
    assert not model.model_anat_pet.freeze_towers  # lr_pretrained=1e-6
    assert model.model_anat_tab.freeze_towers      # default: frozen
    assert model.model_pet_tab.freeze_towers
    _, g = _grads(model, batch)
    for sub in ("model_anat_pet", "model_anat_tab", "model_pet_tab"):
        assert all(not np.asarray(l).any()
                   for l in jax.tree.leaves(g[sub]))
    for name in ("stage3out", "cls3"):
        assert any(np.asarray(l).any() for l in jax.tree.leaves(g[name]))


def test_frozen_backward_is_actually_smaller():
    """The frozen grad graph must not contain the tower backward work."""
    batch = _batch()
    criterion = make_criterion({"loss_class_weights": None})

    def n_eqns(model):
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                batch, train=True, mutable=["batch_stats"])
            return criterion(out["logits"], batch["label"])

        jaxpr = jax.make_jaxpr(jax.grad(loss_fn))(variables["params"])
        text = str(jaxpr)
        return text.count("conv_general_dilated")

    frozen = n_eqns(AnatPETFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": None}, PET_HP, MRI_HP))
    unfrozen = n_eqns(AnatPETFusion.from_hparams(
        {"n_classes": 3}, PET_HP, MRI_HP))
    # towers' dgrad/wgrad convs are gone: at most the forward's conv count
    assert frozen < unfrozen / 2 + 1
