"""Train the tabular MLP (TabPFN replacement; see tabular_mlp.py).

The reference has no tabular *training* script — TabPFN is pretrained and
fit at construction (reference: tabular_models/dl_approach.py:47-54). The
fusion stages need a tabular checkpoint here, so this entry point trains
the on-device MLP on the train-split 9-feature matrix with weighted CE and
saves top-k checkpoints exactly like the other stage-1 scripts.
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.data.tabular import tabular_matrix
from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
    TabularMLP,
    compute_feature_stats,
)
from multimodal_alzheimer_tpu.train import hpo
from multimodal_alzheimer_tpu.train.driver import (
    attach_class_weights,
    build_datasets,
    run_training,
)

LOG_DIRECTORY = "lightning_logs"
EXPERIMENT_NAME = "tabular_mlp"
EXPERIMENT_VERSION = None
SEED = 5


def sample_hparams(trial, n_classes: int = 3) -> dict:
    hparams = {
        "early_stopping_patience": 10,
        "max_epochs": 50,
        "n_classes": n_classes,
        "reduce_factor_lr_schedule": None,
        "best_k_checkpoints": 3,
    }
    hparams["lr"] = trial.suggest_float("lr", 1e-5, 1e-2, log=True)
    hparams["batch_size"] = trial.suggest_categorical("batch_size",
                                                      (16, 32, 64, 128))
    hparams["hidden"] = trial.suggest_categorical(
        "hidden", ("(256, 1024)", "(128, 1024)", "(512, 1024)"))
    hparams["hidden"] = tuple(
        int(x) for x in hparams["hidden"].strip("()").split(","))
    hparams["dropout_p"] = trial.suggest_float("dropout_p", 0.0, 0.5)
    hparams["l2_reg"] = trial.suggest_categorical(
        "l2_reg", (0, 1e-1, 1e-2, 1e-3))
    hparams["fl_gamma"] = trial.suggest_categorical("fl_gamma",
                                                    (None, 1, 2, 5))
    return hparams


def train(hparams: dict, experiment_name: str = "",
          experiment_version=None):
    trainset, valset = build_datasets(hparams, ["tabular"])
    attach_class_weights(hparams, trainset)
    # Standardize with train-split stats, embedded in hparams (and thus in
    # every checkpoint) so fusion stages reuse them.
    mean, std = compute_feature_stats(tabular_matrix(trainset.ds))
    hparams["feature_mean"] = mean
    hparams["feature_std"] = std
    model = TabularMLP.from_hparams(hparams)
    _, _, last_val_loss = run_training(
        model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        log_dir=LOG_DIRECTORY, seed=SEED)
    return last_val_loss


@hpo.oom_guard
def _objective(trial):
    return train(sample_hparams(trial), EXPERIMENT_NAME, EXPERIMENT_VERSION)


def _full_arrays(dataset):
    """Whole-split device-ready arrays for the vectorized HPO path."""
    import numpy as np

    labels = dataset.ds["label"].map(dataset.label_mapping) \
        .to_numpy(np.int32)
    return {"tabular": tabular_matrix(dataset.ds), "label": labels}


def optuna_optimization(n_trials: int = 100, timeout: float = 86400,
                        parallel: int = 0):
    """HPO entry point (reference train_pet_cnn.py:208-216 template).

    ``parallel=K`` switches to the vectorized searcher
    (train/vmap_hpo.py): TPE asks K configs per round, same-architecture
    configs train simultaneously under one ``jax.vmap``-ed program. The
    objective stays the last-val-loss-at-early-stop the sequential path
    returns; the winning config should be refit via ``train()`` when a
    checkpoint is needed (the parallel path skips checkpointing).
    """
    study = hpo.create_study(direction="minimize")
    if parallel and parallel > 1:
        from multimodal_alzheimer_tpu.train import vmap_hpo

        base = {"n_classes": 3}
        trainset, valset = build_datasets(base, ["tabular"])
        attach_class_weights(base, trainset)
        mean, std = compute_feature_stats(tabular_matrix(trainset.ds))
        train_data = _full_arrays(trainset)
        val_data = _full_arrays(valset)

        def signature(hparams):
            return (int(hparams["batch_size"]), tuple(hparams["hidden"]))

        def batch_objective(signature, rows):
            batch_size, hidden = signature
            model = TabularMLP(n_classes=3, hidden=hidden,
                               feature_mean=tuple(mean),
                               feature_std=tuple(std))
            hp = vmap_hpo.stack_trial_hparams(rows, pad_to=parallel)
            values, _ = vmap_hpo.run_parallel_trials(
                model, hp, train_data, val_data,
                batch_size=batch_size,
                max_epochs=int(rows[0]["max_epochs"]),
                patience=int(rows[0]["early_stopping_patience"]),
                class_weights=base["loss_class_weights"], seed=SEED)
            return values[:len(rows)]

        vmap_hpo.optimize_batched(
            study, sample_hparams, batch_objective, n_trials=n_trials,
            parallel=parallel, signature_fn=signature, timeout=timeout)
        return study
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
