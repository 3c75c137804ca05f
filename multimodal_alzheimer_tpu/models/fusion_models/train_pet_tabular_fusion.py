"""Train the stage-2 PET+tabular fusion (reference
train_pet_tabular_fusion.py). Loaders use drop_last=True on both splits
(reference :166, :174). Required hparams: 'path_pet', 'path_tabular'.
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion import (
    PETTabularFusion,
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
EXPERIMENT_NAME = "pet_tabular_fusion"
EXPERIMENT_VERSION = None
SEED = 5

HEAD_NAMES = ("reduce_tab", "reduce_tab_0", "reduce_tab_1",
              "stage2out", "cls2")


def sample_hparams(trial, n_classes: int = 2, path_pet: str = None,
                   path_tabular: str = None) -> dict:
    hparams = {
        "early_stopping_patience": 5,
        "max_epochs": 20,
        "n_classes": n_classes,
        "reduce_factor_lr_schedule": None,
        "best_k_checkpoints": 3,
        "ensemble_size": 4,
        "path_pet": path_pet,
        "path_tabular": path_tabular,
    }
    hparams["lr"] = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
    freeze = trial.suggest_categorical("freeze", (True, False))
    hparams["lr_pretrained"] = (None if freeze else trial.suggest_float(
        "lr_pretrained", 1e-7, 1e-5, log=True))
    hparams["simple_dim_red"] = trial.suggest_categorical(
        "simple_dim_red", (True, False))
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
    tab_vars, tab_hp, _ = load_checkpoint(hparams["path_tabular"])

    normalize_pet, _, _ = stage1_normalizations(pet_hp, None)
    trainset, valset = build_datasets(hparams, ["pet1451", "tabular"],
                                      normalize_pet=normalize_pet)
    attach_class_weights(hparams, trainset)

    model = PETTabularFusion.from_hparams(hparams, pet_hp, tab_hp)
    optimizer = fusion_optimizer(hparams, HEAD_NAMES)

    def graft(variables):
        return graft_params(variables, {"pet_model": pet_vars,
                                        "tab_model": tab_vars})

    _, _, last_val_loss = run_training(
        model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        optimizer=optimizer, log_dir=LOG_DIRECTORY, seed=SEED,
        drop_last=True, variables_transform=graft)
    return last_val_loss


@hpo.oom_guard
def _objective(trial):
    from multimodal_alzheimer_tpu.utils.path_config import load_path_config

    paths = load_path_config()
    hparams = sample_hparams(
        trial, path_pet=str(paths["pet_cnn_2_class"]),
        path_tabular=str(paths["tabular_mlp_2_class"]))
    return train(hparams, EXPERIMENT_NAME, EXPERIMENT_VERSION)


def optuna_optimization(n_trials: int = 300, timeout: float = 86400,
                        parallel: int = 0):
    """``parallel=K`` vectorizes frozen proposals via shared-tower trials
    (train/fusion_hpo.py); unfrozen ones keep the sequential path."""
    study = hpo.create_study(direction="minimize")
    if parallel and parallel > 1:
        from multimodal_alzheimer_tpu.train import fusion_hpo
        from multimodal_alzheimer_tpu.utils.path_config import (
            load_path_config,
        )

        paths = load_path_config()
        return fusion_hpo.optimize_stage2_pet_tab(
            study, sample_hparams,
            hpo.oom_guard(lambda hp: train(hp, EXPERIMENT_NAME,
                                           EXPERIMENT_VERSION)),
            n_trials=n_trials, parallel=parallel, n_classes=2,
            path_pet=str(paths["pet_cnn_2_class"]),
            path_tabular=str(paths["tabular_mlp_2_class"]),
            timeout=timeout)
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
