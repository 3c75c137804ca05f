"""Reference-grade performance comparison figures render correctly."""

import os

import numpy as np
import pandas as pd
import pytest

from multimodal_alzheimer_tpu.utils.plot_performance import (
    STAGE_ORDER,
    collect_scores,
    limit_err_values,
    order_models,
    plot_experiment_comparison,
    plot_scores,
    plot_stage_comparison,
    plot_two_vs_three,
)


def _frame(seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "model": STAGE_ORDER,
        "f1": rng.uniform(0.4, 0.99, 7),
        "f1_ci": rng.uniform(0.0, 0.08, 7),
        "mcc": rng.uniform(0.2, 0.9, 7),
        "mcc_ci": rng.uniform(0.0, 0.08, 7),
    })


def test_limit_err_values_clips_to_unit_interval():
    err = limit_err_values([0.99, 0.5, 0.003], [0.05, 0.1, 0.05])
    vals = np.asarray([0.99, 0.5, 0.003])
    assert np.all(vals + err[1] <= 1.0)
    assert np.all(vals - err[0] >= 0.0)
    # untouched where no clipping needed
    assert err[0][1] == err[1][1] == 0.1


def test_order_models_canonical_stage_order():
    df = _frame().sample(frac=1.0, random_state=3)  # shuffled
    df = pd.concat([df, pd.DataFrame([{"model": "Custom", "f1": 0.5,
                                       "f1_ci": 0, "mcc": 0.4,
                                       "mcc_ci": 0}])])
    out = order_models(df)
    assert list(out["model"][:7]) == STAGE_ORDER
    assert out["model"].iloc[-1] == "Custom"


@pytest.mark.parametrize("color_by_modality", [False, True])
def test_stage_comparison_renders(tmp_path, color_by_modality):
    path = str(tmp_path / "stage.png")
    fig, ax = plot_stage_comparison(_frame(), binary=True,
                                    color_by_modality=color_by_modality,
                                    out_path=path)
    assert os.path.exists(path) and os.path.getsize(path) > 10_000
    # 7 models x 2 metrics = 14 bars
    assert len([p for p in ax.patches
                if p.get_height() > 0]) >= 14


def test_two_vs_three_comparison_figure(tmp_path):
    path = str(tmp_path / "two_vs_three.png")
    fig, axes = plot_two_vs_three(_frame(1), _frame(2), out_path=path)
    assert os.path.exists(path) and os.path.getsize(path) > 10_000
    assert axes[0].get_xlabel() == "2 Targets"
    assert axes[1].get_xlabel() == "3 Targets"


def test_experiment_comparison(tmp_path):
    df = _frame().iloc[:5].copy()
    df["model"] = ["EF-same", "EF-diff", "FMF-concat", "FMF-max", "FC"]
    path = str(tmp_path / "exp.png")
    plot_experiment_comparison(
        df, [("Early Fusion", 2), ("CNN Fusion", 2), ("FC Fusion", 1)],
        out_path=path)
    assert os.path.exists(path) and os.path.getsize(path) > 10_000


def test_collect_scores_then_plot(tmp_path):
    metrics = {"PET": {"test_f1_epoch_boot": 0.9, "test_f1_epoch_ci": 0.02,
                       "test_mcc_epoch_boot": 0.8,
                       "test_mcc_epoch_ci": 0.03},
               "MRI": {"test_f1_epoch": 0.84,
                       "test_mcc_epoch_boot": 0.7}}
    df = collect_scores(metrics)
    assert df.loc[df.model == "PET", "f1"].item() == 0.9
    fig = plot_scores(df, out_path=str(tmp_path / "s.png"))
    assert os.path.getsize(tmp_path / "s.png") > 5_000
