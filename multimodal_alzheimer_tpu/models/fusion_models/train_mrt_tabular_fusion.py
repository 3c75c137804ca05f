"""Train the stage-2 MRI+tabular fusion (reference
train_mrt_tabular_fusion.py; ensemble_size fixed at 4 :69, modalities
['tabular','t1w'] :145). Required hparams: 'path_mri', 'path_tabular'.
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion import (
    TabularMRIFusion,
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
EXPERIMENT_NAME = "tabular_mri_fusion"
EXPERIMENT_VERSION = None
SEED = 5

HEAD_NAMES = ("reduce_tab", "stage2out", "cls2")


def sample_hparams(trial, n_classes: int = 2, path_mri: str = None,
                   path_tabular: str = None) -> dict:
    hparams = {
        "early_stopping_patience": 5,
        "max_epochs": 20,
        "n_classes": n_classes,
        "reduce_factor_lr_schedule": None,
        "best_k_checkpoints": 3,
        "ensemble_size": 4,
        "path_mri": path_mri,
        "path_tabular": path_tabular,
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
    mri_vars, mri_hp, _ = load_checkpoint(hparams["path_mri"])
    tab_vars, tab_hp, _ = load_checkpoint(hparams["path_tabular"])

    _, normalize_mri, quantile = stage1_normalizations(None, mri_hp)
    trainset, valset = build_datasets(hparams, ["tabular", "t1w"],
                                      normalize_mri=normalize_mri,
                                      quantile=quantile)
    attach_class_weights(hparams, trainset)

    model = TabularMRIFusion.from_hparams(hparams, mri_hp, tab_hp)
    optimizer = fusion_optimizer(hparams, HEAD_NAMES)

    def graft(variables):
        return graft_params(variables, {"mri_model": mri_vars,
                                        "tab_model": tab_vars})

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
        trial, path_mri=str(paths["mri_cnn_2_class"]),
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
        return fusion_hpo.optimize_stage2_mri_tab(
            study, sample_hparams,
            hpo.oom_guard(lambda hp: train(hp, EXPERIMENT_NAME,
                                           EXPERIMENT_VERSION)),
            n_trials=n_trials, parallel=parallel, n_classes=2,
            path_mri=str(paths["mri_cnn_2_class"]),
            path_tabular=str(paths["tabular_mlp_2_class"]),
            timeout=timeout)
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
