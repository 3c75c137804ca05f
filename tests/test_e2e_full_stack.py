"""Full 3-stage pipeline e2e: every train entry point, tiny synthetic data.

stage-1 (PET CNN, MRI ResNet-10, tabular MLP) -> stage-2 (all three
pairwise fusions) -> stage-3 (all-modalities) -> evaluation. Exercises
checkpoint grafting across two levels and the early/feature-map fusion
scripts.
"""

import glob
import os

import numpy as np
import pytest

from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split

VOL = (19, 23, 17)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("e2e_full")
    write_synthetic_split(str(ws / "data"), n_subjects=(16, 6, 6), seed=7,
                          volume_shape=VOL)
    old_cwd = os.getcwd()
    os.chdir(ws)
    os.environ["MMALZ_DATA_DIR"] = str(ws / "data")
    yield ws
    os.chdir(old_cwd)
    os.environ.pop("MMALZ_DATA_DIR", None)


def _ckpt(experiment):
    pattern = os.path.join("lightning_logs", experiment, "*",
                           "checkpoints", "*")
    c = sorted(glob.glob(pattern))
    assert c, pattern
    return c[0]


BASE = {"early_stopping_patience": 2, "max_epochs": 1,
        "reduce_factor_lr_schedule": None, "best_k_checkpoints": 1,
        "lr": 1e-3, "batch_size": 4, "fl_gamma": None, "n_classes": 3,
        "l2_reg": 0.0}


def test_three_stage_pipeline(workspace):
    from multimodal_alzheimer_tpu.models.pet_models import train_pet_cnn
    from multimodal_alzheimer_tpu.models.mri_models import train_anat_cnn
    from multimodal_alzheimer_tpu.models.tabular_models import train_tabular

    # ---- stage 1 ----
    pet_hp = dict(BASE, norm_mean=0.5145, norm_std=0.5383,
                  conv_out=(4, 8), filter_size=(3, 3), linear_out=16,
                  batchnorm=False)
    assert np.isfinite(train_pet_cnn.train(pet_hp, "fs_pet"))

    mri_hp = dict(BASE, resnet_depth=10, conv_out=[], filter_size=[],
                  linear_out=(), batchnorm_begin=False,
                  batchnorm_dense=False, norm_percentile=0.98,
                  lr_pretrained=None)
    assert np.isfinite(train_anat_cnn.train_anat(mri_hp, "fs_mri"))

    tab_hp = dict(BASE, hidden=(8, 1024), dropout_p=0.0)
    assert np.isfinite(train_tabular.train(tab_hp, "fs_tab"))

    pet_ckpt, mri_ckpt, tab_ckpt = (_ckpt("fs_pet"), _ckpt("fs_mri"),
                                    _ckpt("fs_tab"))

    # ---- stage 2 ----
    from multimodal_alzheimer_tpu.models.fusion_models import (
        train_anat_pet_fusion,
        train_mrt_tabular_fusion,
        train_pet_tabular_fusion,
    )

    ap_hp = dict(BASE, lr_pretrained=None, path_pet=pet_ckpt,
                 path_mri=mri_ckpt)
    assert np.isfinite(train_anat_pet_fusion.train(ap_hp, "fs_ap"))

    at_hp = dict(BASE, lr_pretrained=None, ensemble_size=4,
                 path_mri=mri_ckpt, path_tabular=tab_ckpt)
    assert np.isfinite(train_mrt_tabular_fusion.train(at_hp, "fs_at"))

    pt_hp = dict(BASE, lr_pretrained=None, ensemble_size=4,
                 simple_dim_red=False, path_pet=pet_ckpt,
                 path_tabular=tab_ckpt)
    assert np.isfinite(train_pet_tabular_fusion.train(pt_hp, "fs_pt"))

    # ---- stage 3 ----
    from multimodal_alzheimer_tpu.models.fusion_models import (
        train_all_modalities_fusion,
    )

    all_hp = dict(BASE, lr_pretrained=None, ensemble_size=4,
                  path_pet=pet_ckpt, path_mri=mri_ckpt,
                  path_tabular=tab_ckpt,
                  path_anat_pet=_ckpt("fs_ap"),
                  path_anat_tab=_ckpt("fs_at"),
                  path_pet_tab=_ckpt("fs_pt"))
    assert np.isfinite(
        train_all_modalities_fusion.train(all_hp, "fs_all"))

    # ---- stage-3 evaluation through the inference entry point ----
    from multimodal_alzheimer_tpu.inference.test_all_mod_fusion import (
        load_fusion,
    )
    from multimodal_alzheimer_tpu.inference.harness import (
        build_testset,
        evaluate,
    )
    from multimodal_alzheimer_tpu.train.driver import stage1_normalizations
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint

    model, variables, hparams, pet_hp_l, mri_hp_l = load_fusion(
        _ckpt("fs_all"))
    pet_n, mri_n, q = stage1_normalizations(pet_hp_l, mri_hp_l)
    testset = build_testset(
        hparams, pet_n, mri_n, q,
        test_csv=os.path.join(str(workspace), "data",
                              "test_path_data_labels.csv"))
    if len(testset) == 0:
        pytest.skip("no fully-paired triples in synthetic test split")
    metrics = evaluate(model, variables, hparams, testset, "fs_eval")
    assert np.isfinite(metrics["test_f1_epoch"])
    assert np.isfinite(metrics["test_mcc_epoch_boot"])


def test_early_and_featuremap_fusion_train(workspace):
    from multimodal_alzheimer_tpu.models.fusion_models import (
        train_anat_pet_featuremapfusion,
        train_early_fusion,
    )

    ef_hp = dict(BASE, n_classes=2, norm_mean=0.5145, norm_std=0.5383,
                 conv_out=(4, 8), filter_size=(3, 3), linear_out=8,
                 batchnorm=False, mri_norm_style="all_scan_norm")
    assert np.isfinite(train_early_fusion.train(ef_hp, "fs_ef"))

    fmf_hp = dict(BASE, n_classes=2, norm_mean=0.5145, norm_std=0.5383,
                  conv_out=(4, 8), filter_size=(3, 3),
                  fusion_mode="maxout", n_layers_fusion=1, n_out_fusion=8,
                  filter_size_fusion=3, batchnorm=False,
                  batchnorm_fusion=False)
    assert np.isfinite(
        train_anat_pet_featuremapfusion.train(fmf_hp, "fs_fmf"))


def test_inference_mains_via_path_config(workspace):
    """The test_<model>.py entry points resolve checkpoints through
    path_config.yaml exactly like the reference's inference scripts
    (reference: test_anat_pet_fusion.py:30-43, load_path_config.py)."""
    import io
    import yaml
    from contextlib import redirect_stdout

    # test_three_stage_pipeline ran first (same module fixture ordering)
    config = {
        "relative": {
            "log_directory": "lightning_logs",
            "test_set_csv": "data/test_path_data_labels.csv",
            "train_set_csv": "data/train_path_data_labels.csv",
            "val_set_csv": "data/val_path_data_labels.csv",
        },
        "pet_cnn_3_class": _ckpt("fs_pet"),
        "mri_cnn_3_class": _ckpt("fs_mri"),
        "tabular_mlp_3_class": _ckpt("fs_tab"),
        "pet_mri_3_class": _ckpt("fs_ap"),
        "mri_tab_3_class": _ckpt("fs_at"),
        "pet_tab_3_class": _ckpt("fs_pt"),
        "all_mod_3_class": _ckpt("fs_all"),
        "early_fusion_same_norm_2_class": _ckpt("fs_ef"),
        "featuremap_fusion_maxout_2_class": _ckpt("fs_fmf"),
    }
    with open("path_config.yaml", "w") as f:
        yaml.safe_dump(config, f)

    from multimodal_alzheimer_tpu.inference import (
        test_all_mod_fusion,
        test_anat_cnn,
        test_anat_pet_fusion,
        test_early_fusion_samenorm,
        test_featuremap_fusion,
        test_mri_tab_fusion,
        test_pet_cnn,
        test_pet_tab_fusion,
        test_tab,
    )

    for main in (test_pet_cnn.main, test_anat_cnn.main, test_tab.main,
                 test_anat_pet_fusion.main, test_mri_tab_fusion.main,
                 test_pet_tab_fusion.main, test_all_mod_fusion.main,
                 test_early_fusion_samenorm.main,
                 test_featuremap_fusion.main):
        buf = io.StringIO()
        with redirect_stdout(buf):
            main()
        out = buf.getvalue()
        assert "test_f1_epoch" in out, (main.__module__, out[:400])


def test_pet_resnet_train_entry(workspace):
    from multimodal_alzheimer_tpu.models.pet_models import (
        train_pet_resnet_cnn,
    )

    hp = dict(BASE, n_classes=2, norm_mean=0.5145, norm_std=0.5383,
              resnet_depth=10, conv_out=[], filter_size=[], linear_out=(),
              batchnorm_begin=False, batchnorm_dense=False,
              lr_pretrained=None)
    assert np.isfinite(train_pet_resnet_cnn.train(hp, "fs_pet_resnet"))
