"""Majority voting, k-fold, split, path config, HPO shim."""

import json

import numpy as np
import pandas as pd

import jax.numpy as jnp

from multimodal_alzheimer_tpu.data.split import split_ids
from multimodal_alzheimer_tpu.train.hpo import RandomStudy, RandomTrial, oom_guard
from multimodal_alzheimer_tpu.train.kfold import patient_kfold_indices, run_kfold
from multimodal_alzheimer_tpu.utils.majority_voting import soft_vote
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def test_soft_vote_unweighted_and_weighted():
    l1 = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
    l2 = jnp.asarray([[0.0, 1.0], [0.0, 1.0]])
    # unweighted: sample 0 -> model1 dominates (prob ~1 vs ~0.27)
    preds = soft_vote([l1, l2])
    np.testing.assert_array_equal(np.asarray(preds), [0, 1])
    # heavily weight model 2 -> its preference wins sample 0
    preds_w = soft_vote([l1, l2], weights=[0.01, 0.99])
    np.testing.assert_array_equal(np.asarray(preds_w), [1, 1])


def test_patient_kfold_no_leakage():
    ids = [f"s{i}" for i in range(23)]
    seen_val = set()
    for train_ids, val_ids in patient_kfold_indices(ids, k=4, seed=1):
        assert not (train_ids & val_ids)
        assert not (seen_val & val_ids)
        seen_val |= val_ids
    assert seen_val == set(ids)


def test_run_kfold_aggregates():
    results, summary = run_kfold(
        lambda tr, va, i: {"val_loss": float(i)}, list(range(10)), k=3)
    assert len(results) == 3
    np.testing.assert_allclose(summary["val_loss_mean"], 1.0)


def test_split_ids_deterministic():
    ids = pd.Series(range(100), name="RID")
    s1 = split_ids(ids)
    s2 = split_ids(ids)
    assert s1 == s2
    assert len(s1["test"]) == 10
    assert len(s1["val"]) == 9  # 10% of the remaining 90
    all_ids = s1["train"] + s1["val"] + s1["test"]
    assert sorted(all_ids) == list(range(100))


def test_load_path_config(tmp_path):
    cfg = tmp_path / "path_config.yaml"
    cfg.write_text(
        "relative:\n  test_set_csv: 'data/test.csv'\n"
        "pet_cnn_2_class: '/ckpts/pet'\n")
    paths = load_path_config(str(cfg), root=str(tmp_path))
    assert str(paths["test_set_csv"]).endswith("data/test.csv")
    assert str(paths["pet_cnn_2_class"]) == "/ckpts/pet"


def test_random_study_api():
    def objective(trial):
        x = trial.suggest_float("x", 1e-3, 1.0, log=True)
        cat = trial.suggest_categorical("cat", (1, 2, 3))
        return x * cat

    study = RandomStudy(seed=0)
    study.optimize(objective, n_trials=20)
    assert len(study.trials) == 20
    assert study.best_value <= min(t[0] for t in study.trials)
    assert "x" in study.best_trial.params


def test_oom_guard():
    import math

    @oom_guard
    def boom():
        raise RuntimeError("RESOURCE_EXHAUSTED: out of TPU HBM")

    assert boom() == math.inf

    @oom_guard
    def other():
        raise ValueError("nope")

    try:
        other()
        assert False
    except ValueError:
        pass


def test_subject_leakage_check():
    from multimodal_alzheimer_tpu.utils.plots_dataset import (
        check_no_subject_leakage,
    )

    check_no_subject_leakage({"train": [1, 2], "val": [3], "test": [4]})
    try:
        check_no_subject_leakage({"train": [1, 2], "val": [2]})
        assert False
    except ValueError as e:
        assert "leaks" in str(e)


def test_label_distribution_frame():
    from multimodal_alzheimer_tpu.utils.plots_dataset import (
        label_distribution_frame,
    )

    frame = pd.DataFrame({"label": ["CN", "CN", "MCI"]})
    out = label_distribution_frame({"train": frame})
    assert set(out["label"]) == {"CN", "MCI"}
    assert out.loc[out["label"] == "CN", "count"].iloc[0] == 2
