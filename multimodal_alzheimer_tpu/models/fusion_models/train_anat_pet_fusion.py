"""Train the stage-2 PET+MRI fusion (reference train_anat_pet_fusion.py).

Stage-1 checkpoints are loaded and their parameters grafted into the fusion
model's submodules (replacing the reference's load_from_checkpoint +
module surgery, train_anat_pet_fusion.py:22-30); dataset normalization
constants come from the stage-1 checkpoints' embedded hparams (:154-171).

Required hparams: 'path_pet', 'path_mri' (stage-1 checkpoint dirs).
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import (
    AnatPETFusion,
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
EXPERIMENT_NAME = "anat_pet_fusion"
EXPERIMENT_VERSION = None
SEED = 5

HEAD_NAMES = ("reduce_dim_mri", "stage2out", "cls2")


def sample_hparams(trial, n_classes: int = 3, path_pet: str = None,
                   path_mri: str = None) -> dict:
    hparams = {
        "early_stopping_patience": 5,
        "max_epochs": 20,
        "n_classes": n_classes,
        "reduce_factor_lr_schedule": None,
        "best_k_checkpoints": 3,
        "path_pet": path_pet,
        "path_mri": path_mri,
    }
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

    normalize_pet, normalize_mri, quantile = stage1_normalizations(pet_hp,
                                                                   mri_hp)
    trainset, valset = build_datasets(
        hparams, ["pet1451", "t1w"], normalize_pet=normalize_pet,
        normalize_mri=normalize_mri, quantile=quantile)
    attach_class_weights(hparams, trainset)

    model = AnatPETFusion.from_hparams(hparams, pet_hp, mri_hp)
    optimizer = fusion_optimizer(hparams, HEAD_NAMES)

    def graft(variables):
        return graft_params(variables, {"pet_model": pet_vars,
                                        "mri_model": mri_vars})

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
    hparams = sample_hparams(trial, path_pet=str(paths["pet_cnn_3_class"]),
                             path_mri=str(paths["mri_cnn_3_class"]))
    return train(hparams, EXPERIMENT_NAME, EXPERIMENT_VERSION)


def optuna_optimization(n_trials: int = 300, timeout: float = 86400,
                        parallel: int = 0):
    """HPO entry point. ``parallel=K`` vectorizes frozen proposals through
    the shared-tower trainer (train/fusion_hpo.py): one tower forward per
    step feeds K vmapped Dense heads, so the stage-1 ResNet cost — all of
    the FLOPs — is amortized K ways. Unfrozen proposals (towers training
    at lr_pretrained) keep the sequential path inside the same study."""
    study = hpo.create_study(direction="minimize")
    if parallel and parallel > 1:
        from multimodal_alzheimer_tpu.train import fusion_hpo
        from multimodal_alzheimer_tpu.utils.path_config import (
            load_path_config,
        )

        paths = load_path_config()
        return fusion_hpo.optimize_stage2_anat_pet(
            study, sample_hparams,
            hpo.oom_guard(lambda hp: train(hp, EXPERIMENT_NAME,
                                           EXPERIMENT_VERSION)),
            n_trials=n_trials, parallel=parallel,
            path_pet=str(paths["pet_cnn_3_class"]),
            path_mri=str(paths["mri_cnn_3_class"]), timeout=timeout)
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
