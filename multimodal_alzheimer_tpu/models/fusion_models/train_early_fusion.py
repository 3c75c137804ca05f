"""Train PET+MRI early fusion (reference train_early_fusion.py).

The MRI branch uses all-scan z-score stats so PET/MRI share normalization
style (reference :139-144: 2-class 426.9336/1018.7830, 3-class
414.8254/920.8566); ``__main__`` runs a fixed best-hparams single run
rather than HPO (:225-256), reproduced here.
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.models.fusion_models.early_fusion import (
    PETMRIEarlyFusion,
)
from multimodal_alzheimer_tpu.train.driver import (
    attach_class_weights,
    build_datasets,
    run_training,
)

LOG_DIRECTORY = "lightning_logs"
EXPERIMENT_NAME = "early_fusion"
EXPERIMENT_VERSION = None
SEED = 5

MRI_ALL_SCAN_STATS = {2: {"mean": 426.9336, "std": 1018.7830},
                      3: {"mean": 414.8254, "std": 920.8566}}

BEST_HPARAMS = {
    # fixed best single-run config in the reference __main__ (:225-256)
    "early_stopping_patience": 30,
    "max_epochs": 300,
    "norm_mean": 0.5145,
    "norm_std": 0.5383,
    "lr": 5e-4,
    "batch_size": 64,
    "conv_out": (8, 16, 32, 64),
    "filter_size": (5, 5, 3, 3),
    "batchnorm": False,
    "n_classes": 2,
    "linear_out": 64,
    "fl_gamma": None,
    "reduce_factor_lr_schedule": 0.5,
    "best_k_checkpoints": 5,
    "mri_norm_style": "all_scan_norm",
}


def train(hparams: dict, experiment_name: str = EXPERIMENT_NAME,
          experiment_version=None):
    normalize_pet = {"mean": hparams["norm_mean"],
                     "std": hparams["norm_std"]}
    if hparams.get("mri_norm_style", "all_scan_norm") == "all_scan_norm":
        normalize_mri = {
            "all_scan_norm": MRI_ALL_SCAN_STATS[hparams["n_classes"]]}
    else:
        normalize_mri = {"per_scan_norm": "min_max"}
    trainset, valset = build_datasets(
        hparams, ["pet1451", "t1w"], normalize_pet=normalize_pet,
        normalize_mri=normalize_mri,
        quantile=hparams.get("norm_percentile", 0.99))
    attach_class_weights(hparams, trainset)
    model = PETMRIEarlyFusion.from_hparams(hparams)
    _, _, last_val_loss = run_training(
        model, hparams, trainset, valset,
        experiment_name=experiment_name,
        experiment_version=experiment_version,
        log_dir=LOG_DIRECTORY, seed=SEED)
    return last_val_loss


if __name__ == "__main__":
    train(dict(BEST_HPARAMS))
