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


def optuna_optimization(n_trials: int = 300, timeout: float = 86400,
                        parallel: int = 0):
    """HPO entry point. ``parallel=K`` switches to the vectorized searcher
    — the MRI wiring (train_anat_cnn.py) with the PET z-score constants:
    static signature (depth, dense block, batchnorm flags, batch size +
    epoch bump), traced lr/l2/gamma, and the two-group ``lr_select``
    (head at lr, backbone at lr_pretrained / 0.0 frozen); the split is
    preprocessed once (fixed normalization constants).
    """
    study = hpo.create_study(direction="minimize")
    if parallel and parallel > 1:
        import jax

        from multimodal_alzheimer_tpu.train import vmap_hpo
        from multimodal_alzheimer_tpu.train.fusion_hpo import full_arrays

        base = {"n_classes": 2}
        trainset, valset = build_datasets(
            base, ["pet1451"],
            normalize_pet={"mean": 0.5145, "std": 0.5383})
        attach_class_weights(base, trainset)
        pre = jax.jit(trainset.get_device_preprocess())
        train_data = pre(full_arrays(trainset))
        val_data = pre(full_arrays(valset))

        def signature(hparams):
            return (int(hparams["resnet_depth"]),
                    tuple(hparams["linear_out"]),
                    bool(hparams["batchnorm_begin"]),
                    bool(hparams["batchnorm_dense"]),
                    int(hparams["batch_size"]),
                    int(hparams["max_epochs"]),
                    int(hparams["early_stopping_patience"]))

        def lr_select(hp_row, keys):
            return (hp_row["lr"] if keys and keys[0] == "head"
                    else hp_row["lr_pretrained"])

        def apply_fn(model, variables, batch, hp, rng, train):
            del hp, rng  # no traced model knobs in this space
            if train:
                return model.apply(variables, batch, train=True,
                                   mutable=["batch_stats"])
            return model.apply(variables, batch, train=False), {}

        def batch_objective(sig, rows):
            model = PETResNetCNN.from_hparams(dict(base, **rows[0]),
                                              freeze_backbone=False)
            hp = vmap_hpo.stack_trial_hparams(rows, pad_to=parallel,
                                              extra_keys=("lr_pretrained",))
            values, _ = vmap_hpo.run_parallel_trials(
                model, hp, train_data, val_data,
                batch_size=int(rows[0]["batch_size"]),
                max_epochs=int(rows[0]["max_epochs"]),
                patience=int(rows[0]["early_stopping_patience"]),
                class_weights=base["loss_class_weights"], seed=SEED,
                apply_fn=apply_fn, lr_select=lr_select)
            return [float(v) for v in values[:len(rows)]]

        vmap_hpo.optimize_batched(study, sample_hparams, batch_objective,
                                  n_trials=n_trials, parallel=parallel,
                                  signature_fn=signature, timeout=timeout)
        return study
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
