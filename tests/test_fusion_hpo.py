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
TAB_HP = {"n_classes": 3, "hidden": (16, 32)}
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
        "tabular": rng.normal(size=(n, 9)).astype(np.float32),
        "label": rng.integers(0, 3, n).astype(np.int32),
    }


def _tower(name):
    model = {
        "pet": lambda: SmallPETCNN.from_hparams(PET_HP),
        "mri": lambda: AnatCNN.from_hparams(MRI_HP, freeze_backbone=False),
        "tab": lambda: __import__(
            "multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp",
            fromlist=["TabularMLP"]).TabularMLP.from_hparams(TAB_HP),
    }[name]()
    example = {k: jnp.asarray(v[:2]) for k, v in _data(4, 0).items()}
    seed = {"pet": 1, "mri": 2, "tab": 3}[name]
    return model, model.init(jax.random.PRNGKey(seed), example, train=False)


def _fusion_case(kind):
    """(head_model, tower_models, tower_vars, graft_map) per stage-2 kind."""
    from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion \
        import PETTabularFusion
    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion \
        import TabularMRIFusion

    hp = {"n_classes": 3, "lr_pretrained": None}
    if kind == "anat_pet":
        names = ("pet", "mri")
        head = AnatPETFusion.from_hparams(hp, PET_HP, MRI_HP)
        graft_keys = {"pet": "pet_model", "mri": "mri_model"}
    elif kind == "mri_tab":
        names = ("mri", "tab")
        head = TabularMRIFusion.from_hparams(hp, MRI_HP, TAB_HP)
        graft_keys = {"mri": "mri_model", "tab": "tab_model"}
    else:
        names = ("pet", "tab")
        head = PETTabularFusion.from_hparams(hp, PET_HP, TAB_HP)
        graft_keys = {"pet": "pet_model", "tab": "tab_model"}
    towers = {n: _tower(n) for n in names}
    tower_models = {n: m for n, (m, _) in towers.items()}
    tower_vars = {n: v for n, (_, v) in towers.items()}
    graft_map = {graft_keys[n]: tower_vars[n] for n in names}
    return head, tower_models, tower_vars, graft_map


def _full_apply(model, variables, batch, hp, rng, train):
    """Full-model apply (towers in-graph) for the reference trajectory."""
    if train:
        return model.apply(variables, batch, train=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": rng})
    return model.apply(variables, batch, train=False), {}


@pytest.mark.parametrize("kind", ["anat_pet", "mri_tab", "pet_tab"])
def test_shared_tower_trials_match_full_model(kind):
    head, tower_models, tower_vars, graft_map = _fusion_case(kind)
    assert head.freeze_towers
    train_data, val_data = _data(24, 3), _data(12, 4)
    hp = vmap_hpo.stack_trial_hparams(ROWS)
    common = dict(batch_size=4, max_epochs=3, patience=10,
                  class_weights=CW, seed=9)

    def full_init(model, key, example, shared):
        variables = model.init(key, example, train=False)
        return graft_params(variables, graft_map)

    _, full_info = vmap_hpo.run_parallel_trials(
        head, hp, train_data, val_data, apply_fn=_full_apply,
        init_fn=full_init, **common)

    _, shared_info = fusion_hpo.run_frozen_fusion_trials(
        head, tower_models, tower_vars, hp, train_data, val_data, **common)

    np.testing.assert_allclose(shared_info["val_history"],
                               full_info["val_history"],
                               rtol=2e-5, atol=1e-6)


def test_shared_tower_trials_mesh_matches_single_device():
    """Trial parallelism for the fusion searches: sharding the vmapped
    head-trial axis over the 8-device mesh (shared tower forward
    replicated, one head trial per device) must reproduce the unsharded
    run — multi-chip evidence for the shared-forward HPO path."""
    from multimodal_alzheimer_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    head, tower_models, tower_vars, _ = _fusion_case("anat_pet")
    train_data, val_data = _data(24, 3), _data(12, 4)
    rows = [dict(ROWS[i % 2], trial_seed=50 + i) for i in range(8)]
    hp = vmap_hpo.stack_trial_hparams(rows)
    common = dict(batch_size=4, max_epochs=2, patience=10,
                  class_weights=CW, seed=9)

    _, plain = fusion_hpo.run_frozen_fusion_trials(
        head, tower_models, tower_vars, hp, train_data, val_data, **common)
    _, sharded = fusion_hpo.run_frozen_fusion_trials(
        head, tower_models, tower_vars, hp, train_data, val_data,
        mesh=make_mesh(8), **common)
    np.testing.assert_allclose(sharded["val_history"],
                               plain["val_history"], rtol=2e-5, atol=1e-6)


def test_stage3_shared_trials_match_full_model():
    """Stage-3: K vmapped stage3out/cls3 heads over ONE shared pass
    through the three frozen stage-2 sub-models must trace the same
    trajectories as the full reference graph (share_towers=False,
    duplicate tower copies, two-level grafting) trained per trial."""
    from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion \
        import AllModalitiesFusion
    from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion \
        import PETTabularFusion
    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion \
        import TabularMRIFusion

    hp2 = {"n_classes": 3, "lr_pretrained": None}
    hp3 = {"n_classes": 3, "lr_pretrained": None}
    towers = {n: _tower(n) for n in ("pet", "mri", "tab")}
    tower_vars = {n: v for n, (_, v) in towers.items()}

    example = {k: jnp.asarray(v[:2]) for k, v in _data(4, 8).items()}
    sub_models = {
        "anat_pet": AnatPETFusion.from_hparams(hp2, PET_HP, MRI_HP),
        "anat_tab": TabularMRIFusion.from_hparams(hp2, MRI_HP, TAB_HP),
        "pet_tab": PETTabularFusion.from_hparams(hp2, PET_HP, TAB_HP),
    }
    sub_ckpt = {n: m.init(jax.random.PRNGKey(40 + i), example, train=False)
                for i, (n, m) in enumerate(sub_models.items())}
    graft_s1 = {"anat_pet": {"pet_model": tower_vars["pet"],
                             "mri_model": tower_vars["mri"]},
                "anat_tab": {"mri_model": tower_vars["mri"],
                             "tab_model": tower_vars["tab"]},
                "pet_tab": {"pet_model": tower_vars["pet"],
                            "tab_model": tower_vars["tab"]}}
    sub_variables = {n: graft_params(sub_ckpt[n], graft_s1[n])
                     for n in sub_models}

    head3 = AllModalitiesFusion.from_hparams(hp3, hp2, hp2, hp2,
                                             PET_HP, MRI_HP, TAB_HP)
    full3 = AllModalitiesFusion.from_hparams(hp3, hp2, hp2, hp2,
                                             PET_HP, MRI_HP, TAB_HP,
                                             share_towers=False)
    assert head3.freeze_towers and not full3.share_towers

    def full_init(model, key, example, shared):
        variables = model.init(key, example, train=False)
        variables = graft_params(variables, {
            "model_anat_pet": sub_ckpt["anat_pet"],
            "model_anat_tab": sub_ckpt["anat_tab"],
            "model_pet_tab": sub_ckpt["pet_tab"]})
        return graft_params(variables, {
            "model_anat_pet/pet_model": tower_vars["pet"],
            "model_anat_pet/mri_model": tower_vars["mri"],
            "model_anat_tab/mri_model": tower_vars["mri"],
            "model_anat_tab/tab_model": tower_vars["tab"],
            "model_pet_tab/pet_model": tower_vars["pet"],
            "model_pet_tab/tab_model": tower_vars["tab"]})

    train_data, val_data = _data(24, 3), _data(12, 4)
    hp = vmap_hpo.stack_trial_hparams(ROWS)
    common = dict(batch_size=4, max_epochs=3, patience=10,
                  class_weights=CW, seed=9)

    _, full_info = vmap_hpo.run_parallel_trials(
        full3, hp, train_data, val_data, apply_fn=_full_apply,
        init_fn=full_init, **common)

    shared_fn, carry0 = fusion_hpo.make_stage3_shared_fn(sub_models,
                                                         sub_variables)
    _, shared_info = fusion_hpo.run_shared_trials(
        head3, shared_fn, carry0, hp, train_data, val_data,
        hook_kwarg="fusion_inputs", **common)

    np.testing.assert_allclose(shared_info["val_history"],
                               full_info["val_history"],
                               rtol=2e-5, atol=1e-6)


def test_head_only_init_matches_full_init():
    head, tower_models, tower_vars, _ = _fusion_case("anat_pet")
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
    head, tower_models, tower_vars, _ = _fusion_case("anat_pet")
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


def test_optimize_stage3_entrypoint(tmp_path):
    """Stage-3 study driver e2e: six fabricated checkpoints (three stage-1
    towers + three stage-2 fusions), frozen proposals vectorized through
    the fusion_inputs head-only path, unfrozen routed sequentially."""
    from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split
    from multimodal_alzheimer_tpu.models.fusion_models import (
        train_all_modalities_fusion,
    )
    from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion \
        import PETTabularFusion
    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion \
        import TabularMRIFusion
    from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
        TabularMLP,
    )
    from multimodal_alzheimer_tpu.train import hpo
    from multimodal_alzheimer_tpu.train.checkpoint import save_checkpoint

    vol = (19, 23, 17)
    # triple (PET+MRI+tab) pairing is sparse on synthetic sessions: this
    # subjects/seed combo yields 25 train / 8 val triples (non-empty val).
    write_synthetic_split(str(tmp_path / "data"), n_subjects=(24, 10, 4),
                          seed=3, volume_shape=vol)

    rng = np.random.default_rng(0)
    example = {
        "pet1451": jnp.asarray(rng.normal(size=(2,) + vol)
                               .astype(np.float32)),
        "mri": jnp.asarray(rng.normal(size=(2,) + vol).astype(np.float32)),
        "tabular": jnp.asarray(rng.normal(size=(2, 9)).astype(np.float32)),
    }
    pet_hp = dict(PET_HP, norm_mean=0.5145, norm_std=0.5383,
                  batchnorm=False)
    mri_hp = dict(MRI_HP, conv_out=[], filter_size=[], linear_out=(),
                  batchnorm_begin=False, batchnorm_dense=False,
                  norm_percentile=0.98, lr_pretrained=None)
    tab_hp = dict(TAB_HP, dropout_p=0.0)
    hp2 = {"n_classes": 3, "lr_pretrained": None, "simple_dim_red": False}
    models = {
        "pet": SmallPETCNN.from_hparams(pet_hp),
        "mri": AnatCNN.from_hparams(mri_hp, freeze_backbone=False),
        "tabular": TabularMLP.from_hparams(tab_hp),
        "anat_pet": AnatPETFusion.from_hparams(hp2, pet_hp, mri_hp),
        "anat_tab": TabularMRIFusion.from_hparams(hp2, mri_hp, tab_hp),
        "pet_tab": PETTabularFusion.from_hparams(hp2, pet_hp, tab_hp),
    }
    hps = {"pet": pet_hp, "mri": mri_hp, "tabular": tab_hp,
           "anat_pet": hp2, "anat_tab": hp2, "pet_tab": hp2}
    paths = {}
    for i, (name, model) in enumerate(models.items()):
        variables = model.init(jax.random.PRNGKey(10 + i), example,
                               train=False)
        save_checkpoint(tmp_path / f"{name}_ckpt", variables, hps[name])
        paths[f"path_{name}"] = str(tmp_path / f"{name}_ckpt")

    sequential_calls = []

    def sequential_objective(hparams):
        sequential_calls.append(hparams)
        return 1.5

    old = os.environ.get("MMALZ_DATA_DIR")
    os.environ["MMALZ_DATA_DIR"] = str(tmp_path / "data")
    try:
        study = hpo.create_study(direction="minimize")
        fusion_hpo.optimize_stage3_all_modalities(
            study, train_all_modalities_fusion.sample_hparams,
            sequential_objective, n_trials=4, parallel=2, **paths)
    finally:
        if old is None:
            os.environ.pop("MMALZ_DATA_DIR", None)
        else:
            os.environ["MMALZ_DATA_DIR"] = old

    assert len(study.trials) == 4
    values = [v for v, _ in study.trials]
    assert all(np.isfinite(v) or v == math.inf for v in values)
    frozen_told = sum(1 for v in values if v != 1.5)
    assert frozen_told + len(sequential_calls) == 4
    for hparams in sequential_calls:
        assert hparams["lr_pretrained"] is not None
