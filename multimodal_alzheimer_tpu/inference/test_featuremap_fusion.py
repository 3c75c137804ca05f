"""Evaluate feature-map fusion, concat and maxout variants (reference
inference/test_featuremap_fusion.py:40-49)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import evaluate_checkpoint
from multimodal_alzheimer_tpu.models.fusion_models.featuremap_fusion import (
    PETMRIFeatureMapFusion,
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
    for key, name in (
            ("featuremap_fusion_maxout_2_class", "test_set_fmf_maxout"),
            ("featuremap_fusion_concat_2_class", "test_set_fmf_concat")):
        if key in paths:
            metrics = evaluate_checkpoint(
                PETMRIFeatureMapFusion.from_hparams, str(paths[key]), name,
                normalization_from=_norms)
            print(key, metrics)


if __name__ == "__main__":
    main()
