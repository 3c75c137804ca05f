"""Evaluate early fusion under all-scan MRI normalization (reference
inference/test_early_fusion_samenorm.py:15-18)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import evaluate_checkpoint
from multimodal_alzheimer_tpu.models.fusion_models.early_fusion import (
    PETMRIEarlyFusion,
)
from multimodal_alzheimer_tpu.models.fusion_models.train_early_fusion import (
    MRI_ALL_SCAN_STATS,
)
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def _norms(hparams):
    return ({"mean": float(hparams["norm_mean"]),
             "std": float(hparams["norm_std"])},
            {"all_scan_norm": MRI_ALL_SCAN_STATS[hparams["n_classes"]]},
            0.99)


def main():
    paths = load_path_config()
    key = "early_fusion_same_norm_2_class"
    if key in paths:
        metrics = evaluate_checkpoint(
            PETMRIEarlyFusion.from_hparams, str(paths[key]),
            "test_set_early_fusion_samenorm", normalization_from=_norms)
        print(key, metrics)


if __name__ == "__main__":
    main()
