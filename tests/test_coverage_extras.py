"""Coverage for remaining utilities: decision tree, plots, IO edge cases."""

import json

import numpy as np
import pandas as pd
import pytest

from multimodal_alzheimer_tpu.data.nifti import load_nifti, save_nifti


def test_decision_tree_baseline():
    from multimodal_alzheimer_tpu.models.tabular_models.decision_tree import (
        predict_mci,
        train_decision_tree,
    )

    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 9))
    y = (x[:, 0] > 0).astype(int)  # separable on feature 0
    clf = train_decision_tree(x, y, class_weight="balanced")
    acc = (clf.predict(x) == y).mean()
    assert acc > 0.95
    fractions = predict_mci(clf, rng.normal(size=(50, 9)))
    np.testing.assert_allclose(fractions.sum(), 1.0)


def test_feature_stats():
    from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (
        compute_feature_stats,
    )

    x = np.array([[1.0, 2.0], [3.0, 2.0]])
    mean, std = compute_feature_stats(x)
    np.testing.assert_allclose(mean, [2.0, 2.0])
    assert std[1] == 1.0  # zero-std guarded to 1


def test_plot_performance(tmp_path):
    from multimodal_alzheimer_tpu.utils.plot_performance import (
        collect_scores,
        plot_scores,
    )

    metrics = {
        "pet": {"test_f1_epoch_boot": 0.9, "test_f1_epoch_ci": 0.02,
                "test_mcc_epoch_boot": 0.8, "test_mcc_epoch_ci": 0.03},
        "mri": {"test_f1_epoch_boot": 0.85, "test_f1_epoch_ci": 0.04,
                "test_mcc_epoch_boot": 0.7, "test_mcc_epoch_ci": 0.05},
    }
    frame = collect_scores(metrics)
    assert list(frame["model"]) == ["pet", "mri"]
    out = tmp_path / "scores.png"
    plot_scores(frame, "f1", "2-class", str(out))
    assert out.exists() and out.stat().st_size > 0


def test_split_tabular_writes_json(tmp_path):
    from multimodal_alzheimer_tpu.data.split import split_tabular

    csv = tmp_path / "adni.csv"
    pd.DataFrame({"RID": list(range(50)) * 2}).to_csv(csv, index=False)
    out = tmp_path / "split.json"
    split = split_tabular(str(csv), str(out))
    with open(out) as f:
        loaded = json.load(f)
    assert loaded == split
    assert len(split["test"]) == 5


def test_nifti_error_paths(tmp_path):
    p = tmp_path / "bad.nii"
    p.write_bytes(b"\x00" * 100)
    with pytest.raises(ValueError):
        load_nifti(p)
    # wrong magic
    q = tmp_path / "bad2.nii"
    blob = bytearray(352)
    import struct

    struct.pack_into("<i", blob, 0, 348)
    struct.pack_into("<8h", blob, 40, 3, 2, 2, 2, 1, 1, 1, 1)
    struct.pack_into("<h", blob, 70, 16)
    blob[344:348] = b"xxx\x00"
    q.write_bytes(bytes(blob))
    with pytest.raises(ValueError):
        load_nifti(q)


def test_nifti_scl_scaling(tmp_path):
    """scl_slope/inter applied like nibabel get_fdata."""
    import gzip
    import struct

    vol = np.arange(8, dtype=np.int16).reshape(2, 2, 2)
    p = tmp_path / "scaled.nii"
    save_nifti(p, vol)
    raw = bytearray(p.read_bytes())
    struct.pack_into("<f", raw, 112, 2.0)   # scl_slope
    struct.pack_into("<f", raw, 116, 10.0)  # scl_inter
    p.write_bytes(bytes(raw))
    out = load_nifti(p)
    np.testing.assert_allclose(
        out, vol.astype(np.float32).reshape(2, 2, 2, order="F")
        .reshape(2, 2, 2) * 2 + 10)


def test_collate_mixed():
    from multimodal_alzheimer_tpu.data.pipeline import collate

    batch = collate([
        {"x": np.zeros((2, 2)), "label": np.int32(1)},
        {"x": np.ones((2, 2)), "label": np.int32(0)},
    ])
    assert batch["x"].shape == (2, 2, 2)
    assert batch["label"].shape == (2,)


def test_pairing_time_deltas():
    from multimodal_alzheimer_tpu.utils.plots_dataset import (
        pairing_time_deltas,
    )

    frame = pd.DataFrame({
        "min_time": pd.to_datetime(["2020-01-01", "2020-02-01"]),
        "max_time": pd.to_datetime(["2020-01-11", "2020-02-01"]),
    })
    np.testing.assert_array_equal(pairing_time_deltas(frame), [10, 0])


def test_bench_analytic_flops_constant():
    """Pin the audited flagship FLOP count (BASELINE.md round-3 audit).

    444.9 GFLOP/volume = analytic conv fwd+dgrad+wgrad of the dilated
    Med3D ResNet-18 at 91x109x91; the MFU bench.py reports divides by
    this, so an accidental edit to the formula must fail loudly.
    """
    import bench

    assert bench.analytic_flops_per_volume() == 444_904_047_616
