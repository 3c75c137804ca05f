"""Train the stage-3 all-modalities fusion (reference
train_all_modalities_fusion.py: wires 5 checkpoint paths per class count
:129-152, full 3-modality dataset :158-173).

Required hparams: stage-2 paths 'path_anat_pet', 'path_anat_tab',
'path_pet_tab' and stage-1 paths 'path_pet', 'path_mri', 'path_tabular'.
The stage-2 checkpoints carry the trained fusion heads; stage-1 params are
grafted beneath each stage-2 submodule (the reference reconstructs the same
nesting via load_from_checkpoint chains, all_modalities_fusion.py:17-26).
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion import (
    AllModalitiesFusion,
)
from multimodal_alzheimer_tpu.train import hpo
from multimodal_alzheimer_tpu.train.checkpoint import graft_params, load_checkpoint
from multimodal_alzheimer_tpu.train.driver import (
    attach_class_weights,
    build_datasets,
    fusion_optimizer,
    run_training,
    stage1_normalizations,
)

LOG_DIRECTORY = "lightning_logs"
EXPERIMENT_NAME = "all_modalities_fusion"
EXPERIMENT_VERSION = None
SEED = 5

HEAD_NAMES = ("stage3out", "cls3")


def sample_hparams(trial, n_classes: int = 3, **paths) -> dict:
    hparams = {
        "early_stopping_patience": 5,
        "max_epochs": 20,
        "n_classes": n_classes,
        "reduce_factor_lr_schedule": None,
        "best_k_checkpoints": 3,
        "ensemble_size": 4,
    }
    hparams.update(paths)
    hparams["lr"] = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
    freeze = trial.suggest_categorical("freeze", (True, False))
    hparams["lr_pretrained"] = (None if freeze else trial.suggest_float(
        "lr_pretrained", 1e-7, 1e-5, log=True))
    hparams["batch_size"] = trial.suggest_categorical("batch_size",
                                                      (8, 16, 32, 64))
    hparams["l2_reg"] = trial.suggest_categorical(
        "l2_reg", (0, 1e-1, 1e-2, 1e-3))
    hparams["fl_gamma"] = trial.suggest_categorical("fl_gamma",
                                                    (None, 1, 2, 5))
    return hparams


def train(hparams: dict, experiment_name: str = "",
          experiment_version=None):
    pet_vars, pet_hp, _ = load_checkpoint(hparams["path_pet"])
    mri_vars, mri_hp, _ = load_checkpoint(hparams["path_mri"])
    tab_vars, tab_hp, _ = load_checkpoint(hparams["path_tabular"])
    ap_vars, ap_hp, _ = load_checkpoint(hparams["path_anat_pet"])
    at_vars, at_hp, _ = load_checkpoint(hparams["path_anat_tab"])
    pt_vars, pt_hp, _ = load_checkpoint(hparams["path_pet_tab"])

    normalize_pet, normalize_mri, quantile = stage1_normalizations(pet_hp,
                                                                   mri_hp)
    trainset, valset = build_datasets(
        hparams, ["pet1451", "t1w", "tabular"],
        normalize_pet=normalize_pet, normalize_mri=normalize_mri,
        quantile=quantile)
    attach_class_weights(hparams, trainset)

    model = AllModalitiesFusion.from_hparams(
        hparams, ap_hp, at_hp, pt_hp, pet_hp, mri_hp, tab_hp)
    optimizer = fusion_optimizer(hparams, HEAD_NAMES)

    def graft(variables):
        # stage-2 heads first, then stage-1 weights beneath them (the
        # stage-2 checkpoints already contain trained stage-1 subtrees, but
        # re-grafting stage-1 reproduces the reference's loading order).
        variables = graft_params(variables, {
            "model_anat_pet": ap_vars,
            "model_anat_tab": at_vars,
            "model_pet_tab": pt_vars,
        })
        return graft_params(variables, {
            "model_anat_pet/pet_model": pet_vars,
            "model_anat_pet/mri_model": mri_vars,
            "model_anat_tab/mri_model": mri_vars,
            "model_anat_tab/tab_model": tab_vars,
            "model_pet_tab/pet_model": pet_vars,
            "model_pet_tab/tab_model": tab_vars,
        })

    _, _, last_val_loss = run_training(
        model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        optimizer=optimizer, log_dir=LOG_DIRECTORY, seed=SEED,
        variables_transform=graft)
    return last_val_loss


@hpo.oom_guard
def _objective(trial):
    from multimodal_alzheimer_tpu.utils.path_config import load_path_config

    paths = load_path_config()
    hparams = sample_hparams(
        trial,
        path_pet=str(paths["pet_cnn_3_class"]),
        path_mri=str(paths["mri_cnn_3_class"]),
        path_tabular=str(paths["tabular_mlp_3_class"]),
        path_anat_pet=str(paths["pet_mri_3_class"]),
        path_anat_tab=str(paths["mri_tab_3_class"]),
        path_pet_tab=str(paths["pet_tab_3_class"]))
    return train(hparams, EXPERIMENT_NAME, EXPERIMENT_VERSION)


def optuna_optimization(n_trials: int = 300, timeout: float = 86400,
                        parallel: int = 0):
    """``parallel=K`` vectorizes frozen proposals: one pass through the
    three frozen stage-2 sub-models (stage-1 towers shared, the
    share_towers forward) feeds K vmapped stage-3 heads per step
    (train/fusion_hpo.py); unfrozen ones keep the sequential path."""
    study = hpo.create_study(direction="minimize")
    if parallel and parallel > 1:
        from multimodal_alzheimer_tpu.train import fusion_hpo
        from multimodal_alzheimer_tpu.utils.path_config import (
            load_path_config,
        )

        paths = load_path_config()
        return fusion_hpo.optimize_stage3_all_modalities(
            study, sample_hparams,
            hpo.oom_guard(lambda hp: train(hp, EXPERIMENT_NAME,
                                           EXPERIMENT_VERSION)),
            n_trials=n_trials, parallel=parallel,
            path_pet=str(paths["pet_cnn_3_class"]),
            path_mri=str(paths["mri_cnn_3_class"]),
            path_tabular=str(paths["tabular_mlp_3_class"]),
            path_anat_pet=str(paths["pet_mri_3_class"]),
            path_anat_tab=str(paths["mri_tab_3_class"]),
            path_pet_tab=str(paths["pet_tab_3_class"]), timeout=timeout)
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
