"""Train the PET Med3D-ResNet classifier (reference train_pet_resnet_cnn.py).

Parity notes (reference: pet_models/train_pet_resnet_cnn.py): seed 15,
resnet depth in {10, 18, 50} (:95), freeze-vs-lr_pretrained sampling
(:102-108), PET z-score constants, and — a reference quirk — early stopping
monitors the *step-level* 'val_loss' rather than 'val_loss_epoch' (:218);
here both resolve to the epoch metric (documented divergence).
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.mri_models.train_anat_cnn import (
    backbone_head_optimizer,
    generate_linear_block_options,
)
from multimodal_alzheimer_tpu.models.pet_models.pet_resnet_cnn import PETResNetCNN
from multimodal_alzheimer_tpu.train import hpo
from multimodal_alzheimer_tpu.train.driver import (
    attach_class_weights,
    build_datasets,
    run_training,
)

LOG_DIRECTORY = "lightning_logs"
EXPERIMENT_NAME = "optuna_pet_resnet"
EXPERIMENT_VERSION = None
SEED = 15


def sample_hparams(trial, n_classes: int = 2) -> dict:
    hparams = {
        "early_stopping_patience": 5,
        "max_epochs": 20,
        "norm_mean": 0.5145,
        "norm_std": 0.5383,
        "n_classes": n_classes,
        "reduce_factor_lr_schedule": None,
        "best_k_checkpoints": 3,
    }
    dense_options = {str(o): o for o in
                     generate_linear_block_options([256, 128, 64], [0, 3])}
    hparams["lr"] = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
    freeze = trial.suggest_categorical("freeze", (True, False))
    hparams["lr_pretrained"] = (None if freeze else trial.suggest_float(
        "lr_pretrained", 1e-7, 1e-5, log=True))
    hparams["conv_out"] = []
    hparams["filter_size"] = []
    hparams["batchnorm_begin"] = trial.suggest_categorical(
        "batchnorm_begin", (True, False))
    hparams["batchnorm_dense"] = trial.suggest_categorical(
        "batchnorm_dense", (True, False))
    hparams["batch_size"] = trial.suggest_categorical("batch_size",
                                                      (8, 16, 32, 64))
    if hparams["batch_size"] >= 64:
        hparams["early_stopping_patience"] = 10
        hparams["max_epochs"] = 50
    hparams["l2_reg"] = trial.suggest_categorical(
        "l2_reg", (0, 1e-1, 1e-2, 1e-3))
    hparams["fl_gamma"] = trial.suggest_categorical("fl_gamma",
                                                    (None, 1, 2, 5))
    hparams["resnet_depth"] = trial.suggest_categorical("resnet_depth",
                                                        (10, 18, 50))
    dense_idx = trial.suggest_categorical("linear_out", list(dense_options))
    hparams["linear_out"] = dense_options[dense_idx]
    return hparams


def train(hparams: dict, experiment_name: str = "",
          experiment_version=None):
    normalization_pet = {"mean": hparams["norm_mean"],
                         "std": hparams["norm_std"]}
    trainset, valset = build_datasets(hparams, ["pet1451"],
                                      normalize_pet=normalization_pet)
    attach_class_weights(hparams, trainset)
    model = PETResNetCNN.from_hparams(hparams)
    optimizer = backbone_head_optimizer(hparams, None)
    _, _, last_val_loss = run_training(
        model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        optimizer=optimizer, log_dir=LOG_DIRECTORY, seed=SEED)
    return last_val_loss


@hpo.oom_guard
def _objective(trial):
    return train(sample_hparams(trial), EXPERIMENT_NAME, EXPERIMENT_VERSION)


def optuna_optimization(n_trials: int = 300, timeout: float = 86400):
    study = hpo.create_study(direction="minimize")
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
