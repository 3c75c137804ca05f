"""Evaluate the stage-3 all-modalities fusion (reference
inference/test_all_mod_fusion.py)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import build_testset, evaluate
from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion import (
    AllModalitiesFusion,
)
from multimodal_alzheimer_tpu.train.checkpoint import (
    assert_tower_duplicates_equal,
    load_checkpoint,
)
from multimodal_alzheimer_tpu.train.driver import stage1_normalizations
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def load_fusion(checkpoint_path: str):
    variables, hparams, _ = load_checkpoint(checkpoint_path)
    _, pet_hp, _ = load_checkpoint(hparams["path_pet"])
    _, mri_hp, _ = load_checkpoint(hparams["path_mri"])
    _, tab_hp, _ = load_checkpoint(hparams["path_tabular"])
    _, ap_hp, _ = load_checkpoint(hparams["path_anat_pet"])
    _, at_hp, _ = load_checkpoint(hparams["path_anat_tab"])
    _, pt_hp, _ = load_checkpoint(hparams["path_pet_tab"])
    model = AllModalitiesFusion.from_hparams(
        hparams, ap_hp, at_hp, pt_hp, pet_hp, mri_hp, tab_hp)
    if model.share_towers:
        # sharing reads only the canonical tower copies — refuse to
        # silently change predictions of a checkpoint whose duplicates
        # genuinely diverged (towers trained unfrozen)
        assert_tower_duplicates_equal(variables)
    return model, variables, hparams, pet_hp, mri_hp


def main():
    paths = load_path_config()
    for key, name in (("all_mod_2_class", "test_set_all_mod_2_class"),
                      ("all_mod_3_class", "test_set_all_mod_3_class")):
        if key in paths:
            model, variables, hparams, pet_hp, mri_hp = load_fusion(
                str(paths[key]))
            pet_n, mri_n, q = stage1_normalizations(pet_hp, mri_hp)
            testset = build_testset(hparams, pet_n, mri_n, q)
            print(key, evaluate(model, variables, hparams, testset, name))


if __name__ == "__main__":
    main()
