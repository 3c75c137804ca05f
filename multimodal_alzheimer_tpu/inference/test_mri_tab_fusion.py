"""Evaluate the stage-2 MRI+tabular fusion (reference
inference/test_mri_tab_fusion.py)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import build_testset, evaluate
from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion import (
    TabularMRIFusion,
)
from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
from multimodal_alzheimer_tpu.train.driver import stage1_normalizations
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def load_fusion(checkpoint_path: str):
    variables, hparams, _ = load_checkpoint(checkpoint_path)
    _, mri_hp, _ = load_checkpoint(hparams["path_mri"])
    _, tab_hp, _ = load_checkpoint(hparams["path_tabular"])
    model = TabularMRIFusion.from_hparams(hparams, mri_hp, tab_hp)
    return model, variables, hparams, mri_hp


def main():
    paths = load_path_config()
    for key, name in (("mri_tab_2_class", "test_set_mri_tab_2_class"),
                      ("mri_tab_3_class", "test_set_mri_tab_3_class")):
        if key in paths:
            model, variables, hparams, mri_hp = load_fusion(str(paths[key]))
            _, mri_n, q = stage1_normalizations(None, mri_hp)
            testset = build_testset(hparams, None, mri_n, q)
            print(key, evaluate(model, variables, hparams, testset, name))


if __name__ == "__main__":
    main()
