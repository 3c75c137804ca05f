"""Evaluate the stage-2 PET+MRI fusion (reference
inference/test_anat_pet_fusion.py: fusion checkpoint + stage-1 paths from
path_config :30-43)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import build_testset, evaluate
from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion import (
    AnatPETFusion,
)
from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
from multimodal_alzheimer_tpu.train.driver import stage1_normalizations
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def load_fusion(checkpoint_path: str):
    variables, hparams, _ = load_checkpoint(checkpoint_path)
    _, pet_hp, _ = load_checkpoint(hparams["path_pet"])
    _, mri_hp, _ = load_checkpoint(hparams["path_mri"])
    model = AnatPETFusion.from_hparams(hparams, pet_hp, mri_hp)
    return model, variables, hparams, pet_hp, mri_hp


def main():
    paths = load_path_config()
    for key, name in (("pet_mri_2_class", "test_set_pet_mri_2_class"),
                      ("pet_mri_3_class", "test_set_pet_mri_3_class")):
        if key in paths:
            model, variables, hparams, pet_hp, mri_hp = load_fusion(
                str(paths[key]))
            pet_n, mri_n, q = stage1_normalizations(pet_hp, mri_hp)
            testset = build_testset(hparams, pet_n, mri_n, q)
            print(key, evaluate(model, variables, hparams, testset, name))


if __name__ == "__main__":
    main()
