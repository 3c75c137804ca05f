"""Evaluate the small PET CNN on the test split (reference
inference/test_pet_cnn.py: 2-class and 3-class checkpoints; normalization
params pulled from the checkpoint's hparams :13-14).
"""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import evaluate_checkpoint
from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import SmallPETCNN
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def _norms(hparams):
    return ({"mean": float(hparams["norm_mean"]),
             "std": float(hparams["norm_std"])}, None, 0.99)


def pet_testset_and_model(checkpoint_path: str):
    from multimodal_alzheimer_tpu.inference.harness import build_testset
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint

    variables, hparams, _ = load_checkpoint(checkpoint_path)
    model = SmallPETCNN.from_hparams(hparams)
    pet, mri, q = _norms(hparams)
    return model, variables, hparams, build_testset(hparams, pet, mri, q)


def main():
    paths = load_path_config()
    for key, name in (("pet_cnn_2_class", "test_set_pet_2_class"),
                      ("pet_cnn_3_class", "test_set_pet_3_class")):
        if key in paths:
            metrics = evaluate_checkpoint(
                SmallPETCNN.from_hparams, str(paths[key]), name,
                normalization_from=_norms)
            print(key, metrics)


if __name__ == "__main__":
    main()
