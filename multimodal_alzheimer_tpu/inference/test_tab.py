"""Evaluate the tabular model (reference inference/test_tab.py, which
wraps TabPFN with hard-coded class weights :25-40; here the TabularMLP
checkpoint carries its weights in hparams)."""

from __future__ import annotations

from multimodal_alzheimer_tpu.inference.harness import evaluate_checkpoint
from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import TabularMLP
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def main():
    paths = load_path_config()
    for key, name in (("tabular_mlp_2_class", "test_set_tab_2_class"),
                      ("tabular_mlp_3_class", "test_set_tab_3_class")):
        if key in paths:
            metrics = evaluate_checkpoint(
                TabularMLP.from_hparams, str(paths[key]), name)
            print(key, metrics)


if __name__ == "__main__":
    main()
