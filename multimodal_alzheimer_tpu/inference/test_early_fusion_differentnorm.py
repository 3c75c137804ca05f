"""Evaluate early fusion under per-scan MRI min-max normalization
(reference inference/test_early_fusion_differentnorm.py:16)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import evaluate_checkpoint
from multimodal_alzheimer_tpu.models.fusion_models.early_fusion import (
    PETMRIEarlyFusion,
)
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def _norms(hparams):
    return ({"mean": float(hparams["norm_mean"]),
             "std": float(hparams["norm_std"])},
            {"per_scan_norm": "min_max"},
            float(hparams.get("norm_percentile", 0.99)))


def main():
    paths = load_path_config()
    key = "early_fusion_different_norm_2_class"
    if key in paths:
        metrics = evaluate_checkpoint(
            PETMRIEarlyFusion.from_hparams, str(paths[key]),
            "test_set_early_fusion_differentnorm", normalization_from=_norms)
        print(key, metrics)


if __name__ == "__main__":
    main()
