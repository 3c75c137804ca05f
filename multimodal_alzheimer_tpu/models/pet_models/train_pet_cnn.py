"""Train the small PET 3D CNN (reference train_pet_cnn.py entry point).

Mirrors the reference's fixed + sampled hyperparameter template
(reference: pet_models/train_pet_cnn.py:32-118): PET z-score constants
0.5145/0.5383, lr log-uniform [5e-6, 1e-3], dynamically generated conv_out
ladders, the four filter-size patterns, batch>=64 raising patience/epochs,
fl_gamma in {None, 1, 2, 5}, seed 5.

Usage:
    python -m multimodal_alzheimer_tpu.models.pet_models.train_pet_cnn
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import SmallPETCNN
from multimodal_alzheimer_tpu.train import hpo
from multimodal_alzheimer_tpu.train.driver import (
    attach_class_weights,
    build_datasets,
    run_training,
)

LOG_DIRECTORY = "lightning_logs"
EXPERIMENT_NAME = "optuna_two_class"
EXPERIMENT_VERSION = None

SEED = 5


def sample_hparams(trial, n_classes: int = 3) -> dict:
    """Reference search space (train_pet_cnn.py:36-109)."""
    conv_out_options = []
    for x in (8, 16, 32):
        for n in (3, 4):
            conv_out_options.append(tuple(2 ** i * x for i in range(n)))
    conv_out_index = {str(o): o for o in conv_out_options}
    filter_size_options = [(5, 5, 3, 3), (7, 5, 3, 3), (5, 5, 5, 3),
                           (3, 3, 3, 3)]
    filter_size_index = {str(o): o for o in filter_size_options}

    hparams = {
        "early_stopping_patience": 5,
        "max_epochs": 20,
        "norm_mean": 0.5145,
        "norm_std": 0.5383,
        "reduce_factor_lr_schedule": None,
        "n_classes": n_classes,
        "best_k_checkpoints": 3,
    }
    hparams["lr"] = trial.suggest_float("learning_rate", 5e-6, 1e-3,
                                        log=True)
    conv_idx = trial.suggest_categorical("conv_out",
                                         list(conv_out_index))
    hparams["conv_out"] = conv_out_index[conv_idx]
    fs_idx = trial.suggest_categorical("filter_size",
                                       list(filter_size_index))
    filter_size = filter_size_index[fs_idx]
    hparams["filter_size"] = filter_size[:len(hparams["conv_out"])]
    hparams["batchnorm"] = trial.suggest_categorical("batchnorm",
                                                     (True, False))
    hparams["linear_out"] = trial.suggest_categorical(
        "linear_out", (False, 32, 64, 128))
    hparams["batch_size"] = trial.suggest_categorical(
        "batch_size", (8, 16, 32, 64))
    if hparams["batch_size"] >= 64:
        hparams["early_stopping_patience"] = 10
        hparams["max_epochs"] = 50
    if trial.suggest_categorical("dropout_conv", (True, False)):
        hparams["dropout_conv_p"] = trial.suggest_float(
            "dropout_conv_p", 0.05, 0.2)
    if trial.suggest_categorical("dropout_dense", (True, False)):
        hparams["dropout_dense_p"] = trial.suggest_float(
            "dropout_dense_p", 0.2, 0.5)
    hparams["fl_gamma"] = trial.suggest_categorical("fl_gamma",
                                                    (None, 1, 2, 5))
    return hparams


def train(hparams: dict, experiment_name: str = "",
          experiment_version=None):
    normalization_pet = {"mean": hparams["norm_mean"],
                         "std": hparams["norm_std"]}
    trainset, valset = build_datasets(hparams, ["pet1451"],
                                      normalize_pet=normalization_pet)
    attach_class_weights(hparams, trainset)
    model = SmallPETCNN.from_hparams(hparams)
    _, _, last_val_loss = run_training(
        model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        log_dir=LOG_DIRECTORY, seed=SEED)
    return last_val_loss


@hpo.oom_guard
def _objective(trial):
    hparams = sample_hparams(trial)
    return train(hparams, EXPERIMENT_NAME, EXPERIMENT_VERSION)


def optuna_optimization(n_trials: int = 300, timeout: float = 86400,
                        parallel: int = 0):
    """HPO entry point. ``parallel=K`` switches to the vectorized searcher
    (train/vmap_hpo.py): the batched TPE asks K configs per round; configs
    sharing the static signature (conv ladder, filter sizes, batchnorm,
    linear_out, batch size and the batch>=64 epoch-budget bump) train
    simultaneously under one ``jax.vmap``-ed program, with lr, focal gamma
    and BOTH dropout rates as traced per-trial values (absent dropout
    knobs trace as rate 0.0 — bit-exact no-dropout, so dropout presence
    never fragments a bucket). The winning config should be refit via
    ``train()`` when a checkpoint is needed.
    """
    study = hpo.create_study(direction="minimize")
    if parallel and parallel > 1:
        from multimodal_alzheimer_tpu.train import vmap_hpo
        from multimodal_alzheimer_tpu.train.fusion_hpo import full_arrays

        import jax

        base = {"n_classes": 3}
        trainset, valset = build_datasets(
            base, ["pet1451"],
            normalize_pet={"mean": 0.5145, "std": 0.5383})
        attach_class_weights(base, trainset)
        # The PET normalization is elementwise + trial-invariant: apply it
        # ONCE over the whole split instead of per step per trial.
        pre = jax.jit(trainset.get_device_preprocess())
        train_data = pre(full_arrays(trainset))
        val_data = pre(full_arrays(valset))

        def signature(hparams):
            return (tuple(hparams["conv_out"]),
                    tuple(hparams["filter_size"]),
                    bool(hparams["batchnorm"]),
                    int(hparams.get("linear_out") or 0),
                    int(hparams["batch_size"]),
                    int(hparams["max_epochs"]),
                    int(hparams["early_stopping_patience"]))

        def apply_fn(model, variables, batch, hp, rng, train):
            if train:
                return model.apply(
                    variables, batch, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"],
                    dropout_conv_rate=hp["dropout_conv_p"],
                    dropout_dense_rate=hp["dropout_dense_p"])
            return model.apply(variables, batch, train=False), {}

        def batch_objective(sig, rows):
            model = SmallPETCNN.from_hparams(
                dict(base, **rows[0]),
                dropout_conv_p=None, dropout_dense_p=None)
            hp = vmap_hpo.stack_trial_hparams(
                rows, pad_to=parallel,
                extra_keys=("dropout_conv_p", "dropout_dense_p"))
            values, _ = vmap_hpo.run_parallel_trials(
                model, hp, train_data, val_data,
                batch_size=int(rows[0]["batch_size"]),
                max_epochs=int(rows[0]["max_epochs"]),
                patience=int(rows[0]["early_stopping_patience"]),
                class_weights=base["loss_class_weights"], seed=SEED,
                apply_fn=apply_fn)
            return [float(v) for v in values[:len(rows)]]

        vmap_hpo.optimize_batched(study, sample_hparams, batch_objective,
                                  n_trials=n_trials, parallel=parallel,
                                  signature_fn=signature, timeout=timeout)
        return study
    study.optimize(_objective, n_trials=n_trials, timeout=timeout)
    return study


if __name__ == "__main__":
    optuna_optimization()
