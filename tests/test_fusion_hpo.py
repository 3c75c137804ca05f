"""Shared-tower frozen-fusion HPO (train/fusion_hpo.py).

The load-bearing claim: K frozen-fusion trials that share ONE tower
forward per step trace the same trajectories as K trials each carrying
their own (identical, frozen) tower copies — tower BN stats update from
inputs alone, so per-trial stats trees could never diverge. Also checks
that head-only init draws the same head values as a full-model init
(flax derives param rngs from module paths, so skipping the tower
submodules must not shift the head draws), and the stage-2 study driver
end-to-end: frozen buckets vectorized, unfrozen routed to the
sequential objective.
"""

import math
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import (
    AnatPETFusion,
)
from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import SmallPETCNN
from multimodal_alzheimer_tpu.train import fusion_hpo, vmap_hpo
from multimodal_alzheimer_tpu.train.checkpoint import graft_params

PET_HP = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
          "linear_out": 8}
MRI_HP = {"n_classes": 3, "resnet_depth": 10}
CW = (0.55, 0.75, 0.7)
S = 16

ROWS = [
    {"lr": 3e-3, "l2_reg": 0.0, "fl_gamma": None, "trial_seed": 11},
    {"lr": 1e-3, "l2_reg": 0.0, "fl_gamma": 2, "trial_seed": 22},
]


def _data(n, seed):
    rng = np.random.default_rng(seed)
    return {
        "pet1451": rng.normal(size=(n, S, S, S)).astype(np.float32),
        "mri": rng.normal(size=(n, S, S, S)).astype(np.float32),
        "label": rng.integers(0, 3, n).astype(np.int32),
    }


def _towers():
    pet_model = SmallPETCNN.from_hparams(PET_HP)
    mri_model = AnatCNN.from_hparams(MRI_HP, freeze_backbone=False)
    example = {k: jnp.asarray(v[:2]) for k, v in _data(4, 0).items()}
    pet_vars = pet_model.init(jax.random.PRNGKey(1), example, train=False)
    mri_vars = mri_model.init(jax.random.PRNGKey(2), example, train=False)
    return ({"pet": pet_model, "mri": mri_model},
            {"pet": pet_vars, "mri": mri_vars})


def _full_apply(model, variables, batch, hp, rng, train):
    """Full-model apply (towers in-graph) for the reference trajectory."""
    if train:
        return model.apply(variables, batch, train=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": rng})
    return model.apply(variables, batch, train=False), {}


def test_shared_tower_trials_match_full_model():
    tower_models, tower_vars = _towers()
    head = AnatPETFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": None}, PET_HP, MRI_HP)
    assert head.freeze_towers
    train_data, val_data = _data(24, 3), _data(12, 4)
    hp = vmap_hpo.stack_trial_hparams(ROWS)
    common = dict(batch_size=4, max_epochs=3, patience=10,
                  class_weights=CW, seed=9)

    def full_init(model, key, example, shared):
        variables = model.init(key, example, train=False)
        return graft_params(variables,
                            {"pet_model": tower_vars["pet"],
                             "mri_model": tower_vars["mri"]})

    _, full_info = vmap_hpo.run_parallel_trials(
        head, hp, train_data, val_data, apply_fn=_full_apply,
        init_fn=full_init, **common)

    _, shared_info = fusion_hpo.run_frozen_fusion_trials(
        head, tower_models, tower_vars, hp, train_data, val_data, **common)

    np.testing.assert_allclose(shared_info["val_history"],
                               full_info["val_history"],
                               rtol=2e-5, atol=1e-6)


def test_head_only_init_matches_full_init():
    tower_models, tower_vars = _towers()
    head = AnatPETFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": None}, PET_HP, MRI_HP)
    example = {k: jnp.asarray(v[:2]) for k, v in _data(4, 5).items()}
    shared_fn, carry0 = fusion_hpo.make_shared_towers_fn(tower_models,
                                                         tower_vars)
    shared_example, _ = shared_fn(carry0, example, False)
    key = jax.random.PRNGKey(3)
    full = head.init(key, example, train=False)
    head_only = fusion_hpo.towers_init_fn(head, key, example, shared_example)
    assert set(head_only["params"]) == {"reduce_dim_mri", "stage2out",
                                        "cls2"}
    assert "batch_stats" not in head_only
    for name in head_only["params"]:
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            head_only["params"][name], full["params"][name])


def test_shared_tower_l2_and_dropoutfree_towers_run():
    """l2>0 decays head params only (fusion_optimizer frozen-group parity);
    just assert it runs finite and differs from the l2=0 trajectory."""
    tower_models, tower_vars = _towers()
    head = AnatPETFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": None}, PET_HP, MRI_HP)
    train_data, val_data = _data(16, 6), _data(8, 7)
    rows = [dict(ROWS[0]), dict(ROWS[0], l2_reg=1e-1)]
    hp = vmap_hpo.stack_trial_hparams(rows)
    vals, info = fusion_hpo.run_frozen_fusion_trials(
        head, tower_models, tower_vars, hp, train_data, val_data,
        batch_size=4, max_epochs=2, patience=10, class_weights=CW, seed=2)
    assert np.isfinite(vals).all()
    assert not np.allclose(info["val_history"][:, 0],
                           info["val_history"][:, 1])


def test_optimize_stage2_entrypoint(tmp_path):
    """Study driver e2e on a synthetic split: frozen buckets vectorize,
    unfrozen proposals hit the sequential objective, every trial told."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.fusion_models import (
        train_anat_pet_fusion,
    )
    from multimodal_alzheimer_tpu.train import hpo
    from multimodal_alzheimer_tpu.train.checkpoint import save_checkpoint

    vol = (19, 23, 17)
    write_synthetic_split(str(tmp_path / "data"), n_subjects=(10, 4, 4),
                          seed=3, volume_shape=vol)

    # Fabricated stage-1 checkpoints: random weights carry the HPO
    # mechanics; only the hparams must be production-shaped.
    rng = np.random.default_rng(0)
    example = {
        "pet1451": jnp.asarray(rng.normal(size=(2,) + vol)
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(size=(2,) + vol).astype(np.float32)),
    }
    pet_hp = dict(PET_HP, norm_mean=0.5145, norm_std=0.5383,
                  batchnorm=False)
    pet_model = SmallPETCNN.from_hparams(pet_hp)
    save_checkpoint(tmp_path / "pet_ckpt",
                    pet_model.init(jax.random.PRNGKey(1), example,
                                   train=False), pet_hp)
    mri_hp = dict(MRI_HP, conv_out=[], filter_size=[], linear_out=(),
                  batchnorm_begin=False, batchnorm_dense=False,
                  norm_percentile=0.98, lr_pretrained=None)
    mri_model = AnatCNN.from_hparams(mri_hp, freeze_backbone=False)
    save_checkpoint(tmp_path / "mri_ckpt",
                    mri_model.init(jax.random.PRNGKey(2), example,
                                   train=False), mri_hp)

    sequential_calls = []

    def sequential_objective(hparams):
        sequential_calls.append(hparams)
        return 1.5

    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    try:
        study = hpo.create_study(direction="minimize")
        fusion_hpo.optimize_stage2_anat_pet(
            study, train_anat_pet_fusion.sample_hparams,
            sequential_objective, n_trials=6, parallel=3,
            path_pet=str(tmp_path / "pet_ckpt"),
            path_mri=str(tmp_path / "mri_ckpt"))
    finally:
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old

    assert len(study.trials) == 6
    values = [v for v, _ in study.trials]
    assert all(np.isfinite(v) or v == math.inf for v in values)
    frozen_told = sum(1 for v in values if v != 1.5)
    assert frozen_told + len(sequential_calls) == 6
    for hparams in sequential_calls:  # only unfrozen rows take that path
        assert hparams["lr_pretrained"] is not None
