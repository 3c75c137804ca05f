"""Entry-point smoke tests: samplers produce valid hparams; models build."""

import importlib

import pytest

from multimodal_alzheimer_tpu.train.hpo import RandomTrial
import random


TRAIN_MODULES = [
    "multimodal_alzheimer_tpu.models.pet_models.train_pet_cnn",
    "multimodal_alzheimer_tpu.models.pet_models.train_pet_resnet_cnn",
    "multimodal_alzheimer_tpu.models.mri_models.train_anat_cnn",
    "multimodal_alzheimer_tpu.models.tabular_models.train_tabular",
    "multimodal_alzheimer_tpu.models.fusion_models.train_anat_pet_fusion",
    "multimodal_alzheimer_tpu.models.fusion_models.train_pet_tabular_fusion",
    "multimodal_alzheimer_tpu.models.fusion_models.train_mrt_tabular_fusion",
    "multimodal_alzheimer_tpu.models.fusion_models."
    "train_all_modalities_fusion",
    "multimodal_alzheimer_tpu.models.fusion_models.train_early_fusion",
    "multimodal_alzheimer_tpu.models.fusion_models."
    "train_anat_pet_featuremapfusion",
]

TEST_MODULES = [
    "multimodal_alzheimer_tpu.inference.test_pet_cnn",
    "multimodal_alzheimer_tpu.inference.test_anat_cnn",
    "multimodal_alzheimer_tpu.inference.test_tab",
    "multimodal_alzheimer_tpu.inference.test_anat_pet_fusion",
    "multimodal_alzheimer_tpu.inference.test_pet_tab_fusion",
    "multimodal_alzheimer_tpu.inference.test_mri_tab_fusion",
    "multimodal_alzheimer_tpu.inference.test_all_mod_fusion",
    "multimodal_alzheimer_tpu.inference.test_early_fusion_samenorm",
    "multimodal_alzheimer_tpu.inference.test_early_fusion_differentnorm",
    "multimodal_alzheimer_tpu.inference.test_featuremap_fusion",
]


@pytest.mark.parametrize("module_name", TRAIN_MODULES + TEST_MODULES)
def test_module_imports(module_name):
    mod = importlib.import_module(module_name)
    assert hasattr(mod, "train") or hasattr(mod, "train_anat") or \
        hasattr(mod, "main")


@pytest.mark.parametrize("module_name,builder", [
    ("multimodal_alzheimer_tpu.models.pet_models.train_pet_cnn",
     "multimodal_alzheimer_tpu.models.pet_models.pet_cnn.SmallPETCNN"),
    ("multimodal_alzheimer_tpu.models.mri_models.train_anat_cnn",
     "multimodal_alzheimer_tpu.models.mri_models.anat_cnn.AnatCNN"),
    ("multimodal_alzheimer_tpu.models.pet_models.train_pet_resnet_cnn",
     "multimodal_alzheimer_tpu.models.pet_models.pet_resnet_cnn"
     ".PETResNetCNN"),
    ("multimodal_alzheimer_tpu.models.tabular_models.train_tabular",
     "multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp"
     ".TabularMLP"),
    ("multimodal_alzheimer_tpu.models.fusion_models."
     "train_anat_pet_featuremapfusion",
     "multimodal_alzheimer_tpu.models.fusion_models.featuremap_fusion"
     ".PETMRIFeatureMapFusion"),
])
def test_sampled_hparams_build_models(module_name, builder):
    mod = importlib.import_module(module_name)
    mod_path, cls_name = builder.rsplit(".", 1)
    cls = getattr(importlib.import_module(mod_path), cls_name)
    rng = random.Random(0)
    for i in range(5):
        trial = RandomTrial(rng, i)
        hparams = mod.sample_hparams(trial)
        model = cls.from_hparams(hparams)
        assert model.n_classes in (2, 3)


def test_early_fusion_best_hparams_build():
    from multimodal_alzheimer_tpu.models.fusion_models.early_fusion import (
        PETMRIEarlyFusion,
    )
    from multimodal_alzheimer_tpu.models.fusion_models.train_early_fusion import (
        BEST_HPARAMS,
    )

    model = PETMRIEarlyFusion.from_hparams(BEST_HPARAMS)
    assert model.n_classes == 2
