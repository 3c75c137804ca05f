"""Evaluate the MRI Med3D classifier (reference inference/test_anat_cnn.py:
per-scan min-max with the checkpoint's quantile)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import evaluate_checkpoint
from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def _norms(hparams):
    return (None, {"per_scan_norm": "min_max"},
            float(hparams.get("norm_percentile", 0.99)))


def main():
    paths = load_path_config()
    for key, name in (("mri_cnn_2_class", "test_set_mri_2_class"),
                      ("mri_cnn_3_class", "test_set_mri_3_class")):
        if key in paths:
            metrics = evaluate_checkpoint(
                AnatCNN.from_hparams, str(paths[key]), name,
                normalization_from=_norms)
            print(key, metrics)


if __name__ == "__main__":
    main()
