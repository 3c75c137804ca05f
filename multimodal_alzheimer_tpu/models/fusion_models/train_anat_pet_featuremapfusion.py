"""Train PET+MRI feature-map fusion (reference
train_anat_pet_featuremapfusion.py: fusion-tower search space :64-117;
``__main__`` runs the best maxout config :280-309).
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.fusion_models.featuremap_fusion import (
    PETMRIFeatureMapFusion,
)
from multimodal_alzheimer_tpu.models.fusion_models.train_early_fusion import (
    MRI_ALL_SCAN_STATS,
)
from multimodal_alzheimer_tpu.train import hpo
from multimodal_alzheimer_tpu.train.driver import (
    attach_class_weights,
    build_datasets,
    run_training,
)

LOG_DIRECTORY = "lightning_logs"
EXPERIMENT_NAME = "featuremap_fusion"
EXPERIMENT_VERSION = None
SEED = 5

BEST_MAXOUT_HPARAMS = {
    "early_stopping_patience": 30,
    "max_epochs": 300,
    "norm_mean": 0.5145,
    "norm_std": 0.5383,
    "lr": 5e-4,
    "batch_size": 32,
    "conv_out": (8, 16, 32),
    "filter_size": (5, 5, 3),
    "batchnorm": True,
    "n_classes": 2,
    "fusion_mode": "maxout",
    "n_layers_fusion": 1,
    "n_out_fusion": 64,
    "filter_size_fusion": 3,
    "batchnorm_fusion": True,
    "fl_gamma": None,
    "reduce_factor_lr_schedule": 0.5,
    "best_k_checkpoints": 3,
}


def sample_hparams(trial, n_classes: int = 2) -> dict:
    hparams = {
        "early_stopping_patience": 5,
        "max_epochs": 20,
        "norm_mean": 0.5145,
        "norm_std": 0.5383,
        "n_classes": n_classes,
        "reduce_factor_lr_schedule": None,
        "best_k_checkpoints": 3,
        "n_layers_fusion": 1,
    }
    conv_out_options = {str(o): o for o in
                        [(8, 16, 32), (16, 32, 64), (8, 16, 32, 64)]}
    fs_options = {str(o): o for o in [(5, 5, 3, 3), (3, 3, 3, 3)]}
    hparams["lr"] = trial.suggest_float("lr", 5e-6, 1e-3, log=True)
    conv_idx = trial.suggest_categorical("conv_out",
                                         list(conv_out_options))
    hparams["conv_out"] = conv_out_options[conv_idx]
    fs_idx = trial.suggest_categorical("filter_size", list(fs_options))
    hparams["filter_size"] = fs_options[fs_idx][:len(hparams["conv_out"])]
    hparams["fusion_mode"] = trial.suggest_categorical(
        "fusion_mode", ("concatenate", "maxout"))
    hparams["n_out_fusion"] = trial.suggest_categorical("n_out_fusion",
                                                        (32, 64, 128))
    hparams["filter_size_fusion"] = trial.suggest_categorical(
        "filter_size_fusion", (3, 5))
    hparams["batchnorm"] = trial.suggest_categorical("batchnorm",
                                                     (True, False))
    hparams["batchnorm_fusion"] = trial.suggest_categorical(
        "batchnorm_fusion", (True, False))
    hparams["batch_size"] = trial.suggest_categorical("batch_size",
                                                      (8, 16, 32, 64))
    hparams["fl_gamma"] = trial.suggest_categorical("fl_gamma",
                                                    (None, 1, 2, 5))
    return hparams


def train(hparams: dict, experiment_name: str = EXPERIMENT_NAME,
          experiment_version=None):
    normalize_pet = {"mean": hparams["norm_mean"],
                     "std": hparams["norm_std"]}
    normalize_mri = {
        "all_scan_norm": MRI_ALL_SCAN_STATS[hparams["n_classes"]]}
    trainset, valset = build_datasets(
        hparams, ["pet1451", "t1w"], normalize_pet=normalize_pet,
        normalize_mri=normalize_mri)
    attach_class_weights(hparams, trainset)
    model = PETMRIFeatureMapFusion.from_hparams(hparams)
    _, _, last_val_loss = run_training(
        model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        log_dir=LOG_DIRECTORY, seed=SEED)
    return last_val_loss


@hpo.oom_guard
def _objective(trial):
    return train(sample_hparams(trial), EXPERIMENT_NAME, EXPERIMENT_VERSION)


def optuna_optimization(n_trials: int = 300, timeout: float = 86400,
                        parallel: int = 0):
    """HPO entry point. ``parallel=K`` vectorizes full-model trials
    (train/vmap_hpo.py): every fusion-tower knob in this space is a
    static arch choice, so the signature carries them all and only
    lr/fl_gamma trace per trial; both normalizations are fixed constants,
    applied once over the split.
    """
    study = hpo.create_study(direction="minimize")
    if parallel and parallel > 1:
        import jax

        from multimodal_alzheimer_tpu.train import vmap_hpo
        from multimodal_alzheimer_tpu.train.fusion_hpo import full_arrays

        base = {"n_classes": 2}
        trainset, valset = build_datasets(
            base, ["pet1451", "t1w"],
            normalize_pet={"mean": 0.5145, "std": 0.5383},
            normalize_mri={"all_scan_norm": MRI_ALL_SCAN_STATS[2]})
        attach_class_weights(base, trainset)
        pre = jax.jit(trainset.get_device_preprocess())
        train_data = pre(full_arrays(trainset))
        val_data = pre(full_arrays(valset))

        def signature(hparams):
            return (tuple(hparams["conv_out"]),
                    tuple(hparams["filter_size"]),
                    hparams["fusion_mode"],
                    int(hparams["n_out_fusion"]),
                    int(hparams["filter_size_fusion"]),
                    bool(hparams["batchnorm"]),
                    bool(hparams["batchnorm_fusion"]),
                    int(hparams["batch_size"]),
                    int(hparams["max_epochs"]),
                    int(hparams["early_stopping_patience"]))

        def apply_fn(model, variables, batch, hp, rng, train):
            del hp, rng  # no traced model knobs in this space
            if train:
                return model.apply(variables, batch, train=True,
                                   mutable=["batch_stats"])
            return model.apply(variables, batch, train=False), {}

        def batch_objective(sig, rows):
            model = PETMRIFeatureMapFusion.from_hparams(
                dict(base, **rows[0]))
            hp = vmap_hpo.stack_trial_hparams(rows, pad_to=parallel)
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
    train(dict(BEST_MAXOUT_HPARAMS))
