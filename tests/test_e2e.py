"""End-to-end: synthetic data -> stage-1 training -> stage-2 fusion ->
evaluation, through the real entry-point code paths."""

import glob
import os

import numpy as np
import pytest

from multimodal_alzheimer_tpu.data.synthetic import write_synthetic_split

VOL = (19, 23, 17)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("e2e")
    write_synthetic_split(str(ws / "data"), n_subjects=(14, 5, 5), seed=1,
                          volume_shape=VOL)
    old_cwd = os.getcwd()
    os.chdir(ws)
    os.environ["MMALZ_DATA_DIR"] = str(ws / "data")
    yield ws
    os.chdir(old_cwd)
    os.environ.pop("MMALZ_DATA_DIR", None)


def _best_checkpoint(log_dir, experiment):
    pattern = os.path.join(log_dir, experiment, "*", "checkpoints", "*")
    candidates = sorted(glob.glob(pattern))
    assert candidates, f"no checkpoints under {pattern}"
    return candidates[0]


def test_stage1_pet_then_tabular_then_fusion_then_eval(workspace):
    from multimodal_alzheimer_tpu.models.pet_models import train_pet_cnn
    from multimodal_alzheimer_tpu.models.tabular_models import train_tabular

    pet_hparams = {
        "early_stopping_patience": 3, "max_epochs": 2,
        "norm_mean": 0.5145, "norm_std": 0.5383,
        "reduce_factor_lr_schedule": 0.5, "n_classes": 3,
        "best_k_checkpoints": 2, "lr": 1e-3, "batch_size": 4,
        "conv_out": (4, 8), "filter_size": (3, 3), "batchnorm": True,
        "linear_out": 16, "fl_gamma": None,
    }
    val_loss = train_pet_cnn.train(pet_hparams, "e2e_pet")
    assert np.isfinite(val_loss)
    pet_ckpt = _best_checkpoint("lightning_logs", "e2e_pet")

    tab_hparams = {
        "early_stopping_patience": 3, "max_epochs": 2, "n_classes": 3,
        "reduce_factor_lr_schedule": None, "best_k_checkpoints": 2,
        "lr": 1e-3, "batch_size": 4, "hidden": (16, 1024),
        "dropout_p": 0.1, "fl_gamma": None,
    }
    val_loss = train_tabular.train(tab_hparams, "e2e_tab")
    assert np.isfinite(val_loss)
    tab_ckpt = _best_checkpoint("lightning_logs", "e2e_tab")

    # checkpoints embed hparams (save_hyperparameters parity)
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint

    _, pet_hp_loaded, metrics = load_checkpoint(pet_ckpt)
    assert pet_hp_loaded["conv_out"] == [4, 8]
    assert "val_loss_epoch" in metrics

    # ---- stage-2 PET+tabular fusion with grafted stage-1 weights ----
    from multimodal_alzheimer_tpu.models.fusion_models import (
        train_pet_tabular_fusion,
    )

    fusion_hparams = {
        "early_stopping_patience": 3, "max_epochs": 2, "n_classes": 3,
        "reduce_factor_lr_schedule": None, "best_k_checkpoints": 1,
        "ensemble_size": 4, "lr": 1e-3, "lr_pretrained": None,
        "simple_dim_red": False, "batch_size": 4, "l2_reg": 0.0,
        "fl_gamma": None, "path_pet": pet_ckpt, "path_tabular": tab_ckpt,
    }
    val_loss = train_pet_tabular_fusion.train(fusion_hparams, "e2e_fusion")
    assert np.isfinite(val_loss)
    fusion_ckpt = _best_checkpoint("lightning_logs", "e2e_fusion")

    # frozen stage-1: grafted PET params unchanged inside fusion checkpoint
    pet_vars, _, _ = load_checkpoint(pet_ckpt)
    fusion_vars, _, _ = load_checkpoint(fusion_ckpt)
    np.testing.assert_array_equal(
        np.asarray(fusion_vars["params"]["pet_model"]["cls"]["kernel"]),
        np.asarray(pet_vars["params"]["cls"]["kernel"]))

    # ---- evaluation through the inference harness ----
    from multimodal_alzheimer_tpu.inference.test_pet_tab_fusion import (
        load_fusion,
    )
    from multimodal_alzheimer_tpu.inference.harness import (
        build_testset,
        evaluate,
    )
    from multimodal_alzheimer_tpu.train.driver import stage1_normalizations

    model, variables, hparams, pet_hp = load_fusion(fusion_ckpt)
    pet_n, _, _ = stage1_normalizations(pet_hp, None)
    testset = build_testset(
        hparams, pet_n, None,
        test_csv=os.path.join(str(workspace), "data",
                              "test_path_data_labels.csv"))
    if len(testset) == 0:
        pytest.skip("no fully-paired triples in synthetic test split")
    metrics = evaluate(model, variables, hparams, testset,
                       "e2e_test_eval")
    for key in ("test_loss_epoch", "test_f1_epoch", "test_f1_epoch_boot",
                "test_f1_epoch_ci", "test_mcc_epoch_boot",
                "test_mcc_epoch_ci"):
        assert key in metrics and np.isfinite(metrics[key]), key
    # the three confusion-matrix PNG variants exist
    log_root = os.path.join("lightning_logs", "e2e_test_eval")
    pngs = glob.glob(os.path.join(log_root, "*", "confusion_matrix*.png"))
    assert len(pngs) >= 3


def test_val_loss_history_is_hpo_objective(workspace):
    """The returned value equals the last val loss (ValidationLossTracker
    parity, train_pet_cnn.py:17-29, 204-205)."""
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import SmallPETCNN
    from multimodal_alzheimer_tpu.train.driver import (
        attach_class_weights,
        build_datasets,
        run_training,
    )

    hparams = {
        "early_stopping_patience": 2, "max_epochs": 2, "n_classes": 2,
        "reduce_factor_lr_schedule": None, "best_k_checkpoints": 1,
        "lr": 1e-3, "batch_size": 4, "conv_out": (4,),
        "filter_size": (3,), "linear_out": 8, "fl_gamma": None,
    }
    trainset, valset = build_datasets(
        hparams, ["pet1451"],
        normalize_pet={"mean": 0.5, "std": 0.6})
    attach_class_weights(hparams, trainset)
    trainer, state, last = run_training(
        SmallPETCNN.from_hparams(hparams), hparams, trainset, valset,
        experiment_name="e2e_objective")
    assert last == trainer.val_loss_history[-1]
    assert len(trainer.val_loss_history) <= 2
