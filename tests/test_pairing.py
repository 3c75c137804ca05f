"""Pairing-expansion parity: vectorized path vs the reference's loop.

The oracle below is a direct transcription of the reference's iterative
algorithm (dataloader.py:124-156) built on this repo's single-row
``find_corresponding_samples``/``merge_two_dfs`` (which are themselves
line-by-line reimplementations of dataloader.py:347-436). The vectorized
``expand_pairings`` must reproduce the row multiset AND order exactly.
"""

from datetime import datetime

import numpy as np
import pandas as pd
import pytest

from multimodal_alzheimer_tpu.data.pairing import (
    expand_pairings,
    find_corresponding_samples,
    merge_two_dfs,
)
from multimodal_alzheimer_tpu.data.synthetic import make_manifest_frame


def _oracle_expand(frames, days_threshold):
    """Reference algorithm: nested Python loop (dataloader.py:124-156)."""
    df_base = frames[0].copy()
    df_base["min_time"] = df_base["ses"]
    df_base["max_time"] = df_base["ses"]
    df_base = df_base.drop(columns="ses")
    df_result_i = df_base
    for i in range(len(frames) - 1):
        df_result_i = pd.DataFrame()
        for _, row in df_base.iterrows():
            df_matching = find_corresponding_samples(
                df=frames[i + 1], id=row["ID"], label=row["label"],
                min_time=row["min_time"], max_time=row["max_time"],
                max_days=days_threshold)
            if len(df_matching) >= 1:
                df_merged = merge_two_dfs(row, df_matching)
                df_result_i = pd.concat([df_result_i, df_merged],
                                        ignore_index=True)
        df_base = df_result_i.copy()
    return df_result_i


def _split_frames(manifest, modalities):
    subset_col = {"pet1451": "path_pet1451", "t1w": "path_anat",
                  "tabular": "AGE"}
    frames = []
    for m in ("pet1451", "t1w", "tabular"):
        if m in modalities:
            f = manifest.dropna(subset=subset_col[m]).reset_index(drop=True)
            f["ses"] = f["ses"].map(
                lambda x: datetime.strptime(x, "%Y-%m-%d"))
            frames.append(f)
    return frames


def _assert_frames_equal(ours, oracle):
    assert len(ours) == len(oracle), (len(ours), len(oracle))
    if len(oracle) == 0:
        return
    for col in oracle.columns:
        assert col in ours.columns, f"missing column {col}"
        a = ours[col].to_numpy()
        b = oracle[col].to_numpy()
        for i, (x, y) in enumerate(zip(a, b)):
            if isinstance(y, float) and pd.isna(y):
                assert pd.isna(x), (col, i, x, y)
            else:
                assert x == y, (col, i, x, y)


@pytest.mark.parametrize("modalities", [
    ["pet1451", "t1w"],
    ["t1w", "tabular"],
    ["pet1451", "tabular"],
    ["pet1451", "t1w", "tabular"],
])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_expand_matches_reference_loop(modalities, seed):
    manifest = make_manifest_frame(n_subjects=8, seed=seed)
    frames = _split_frames(manifest, modalities)
    oracle = _oracle_expand([f.copy() for f in frames], 180)
    ours = expand_pairings([f.copy() for f in frames], 180)
    _assert_frames_equal(ours, oracle)


@pytest.mark.parametrize("threshold", [30, 180, 400])
def test_expand_thresholds(threshold):
    manifest = make_manifest_frame(n_subjects=10, seed=3, max_sessions=4)
    frames = _split_frames(manifest, ["pet1451", "t1w", "tabular"])
    oracle = _oracle_expand([f.copy() for f in frames], threshold)
    ours = expand_pairings([f.copy() for f in frames], threshold)
    _assert_frames_equal(ours, oracle)


def test_expand_no_matches():
    manifest = make_manifest_frame(n_subjects=2, seed=4)
    frames = _split_frames(manifest, ["pet1451", "t1w"])
    # force disjoint subjects so no pairs exist
    frames[1]["ID"] = "sub-9999"
    ours = expand_pairings([f.copy() for f in frames], 180)
    assert len(ours) == 0


def test_window_grows_and_constrains():
    """A sample chain where the window (not pairwise distance to the base)
    is what excludes a match: PET@day0, MRI@day170, TAB@day-170 — TAB is
    within 180 of PET but 340 from MRI, so the triple must be dropped."""
    def frame(modality_col, day, value="x"):
        row = {"ID": "s1", "label": "CN",
               "ses": datetime(2020, 1, 1) + pd.Timedelta(days=day),
               "path_pet1451": np.nan, "path_anat": np.nan, "AGE": np.nan}
        row[modality_col] = value
        return pd.DataFrame([row])

    pet = frame("path_pet1451", 0)
    mri = frame("path_anat", 170)
    tab_far = frame("AGE", -170, 70.0)
    ours = expand_pairings([pet.copy(), mri.copy(), tab_far.copy()], 180)
    assert len(ours) == 0

    tab_near = frame("AGE", 20, 70.0)
    ours = expand_pairings([pet.copy(), mri.copy(), tab_near.copy()], 180)
    oracle = _oracle_expand([pet.copy(), mri.copy(), tab_near.copy()], 180)
    _assert_frames_equal(ours, oracle)
    assert len(ours) == 1
    # the fused row carries data from all three modalities
    assert ours.iloc[0]["path_pet1451"] == "x"
    assert ours.iloc[0]["path_anat"] == "x"
    assert ours.iloc[0]["AGE"] == 70.0
