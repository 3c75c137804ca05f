"""Evaluate the stage-2 PET+tabular fusion (reference
inference/test_pet_tab_fusion.py)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import build_testset, evaluate
from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion import (
    PETTabularFusion,
)
from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
from multimodal_alzheimer_tpu.train.driver import stage1_normalizations
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def load_fusion(checkpoint_path: str):
    variables, hparams, _ = load_checkpoint(checkpoint_path)
    _, pet_hp, _ = load_checkpoint(hparams["path_pet"])
    _, tab_hp, _ = load_checkpoint(hparams["path_tabular"])
    model = PETTabularFusion.from_hparams(hparams, pet_hp, tab_hp)
    return model, variables, hparams, pet_hp


def main():
    paths = load_path_config()
    for key, name in (("pet_tab_2_class", "test_set_pet_tab_2_class"),
                      ("pet_tab_3_class", "test_set_pet_tab_3_class")):
        if key in paths:
            model, variables, hparams, pet_hp = load_fusion(str(paths[key]))
            pet_n, _, _ = stage1_normalizations(pet_hp, None)
            testset = build_testset(hparams, pet_n, None)
            print(key, evaluate(model, variables, hparams, testset, name))


if __name__ == "__main__":
    main()
