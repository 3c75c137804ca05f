"""Manifest builder semantics on a synthetic BIDS tree."""

import os
from datetime import datetime

import numpy as np
import pandas as pd
import pytest

from multimodal_alzheimer_tpu.data.manifest import (
    MANIFEST_COLUMNS,
    build_manifest,
    count_modalities,
    find_closest_timestamp,
    get_diag,
    get_rid_from_id,
)


def _make_bids(tmp_path):
    """Two subjects: one full PET+MRI, one MRI-only w/ too-far diagnosis."""
    for sub, ses in (("sub-1001", "ses-2018-03-01"),
                     ("sub-1002", "ses-2019-05-10")):
        pet = tmp_path / sub / "pet-AV1451" / ses
        pet.mkdir(parents=True)
        (pet / f"{sub}_pet_MNI_2mm.nii.gz").touch()
        (pet / f"{sub}_pet_native.nii.gz").touch()  # must be ignored
        anat = tmp_path / sub / "anat" / ses
        anat.mkdir(parents=True)
        (anat / f"{sub}_T1w_reg_ants2_MNI_2mm.nii.gz").touch()
        (anat / f"{sub}_T1w_native.nii.gz").touch()
    return str(tmp_path)


def test_get_diag_codes():
    assert get_diag({"DXCURREN": 1}) == "CN"
    assert get_diag({"DXCHANGE": 7}) == "CN"   # MCI->CN
    assert get_diag({"DXCHANGE": 4}) == "MCI"  # CN->MCI
    assert get_diag({"DIAGNOSIS": 3}) == "Dementia"
    assert get_diag({"DXCHANGE": 5}) == "Dementia"
    assert get_diag({}) == "not defined"


def test_get_rid():
    assert get_rid_from_id("sub-ADNI123S4567") == 4567
    assert get_rid_from_id("sub-1001") == 1001


def test_find_closest_timestamp():
    df = pd.DataFrame({"EXAMDATE": ["2018-01-01", "2018-06-01",
                                    None, "2017-12-01"]})
    days, idx = find_closest_timestamp(datetime(2018, 2, 1), df)
    assert (days, idx) == (31, 0)


def test_build_manifest(tmp_path):
    root = _make_bids(tmp_path)
    tau = pd.DataFrame([
        {"ID": "sub-1001", "ses": "ses-2018-03-01",
         "pet.modality": "pet-AV1451", "DX": "CN"},
    ])
    diag = pd.DataFrame([
        # close enough for sub-1001 (within 150 days)
        {"RID": 1001, "EXAMDATE": "2018-02-01", "DXCURREN": 2},
        # too far for sub-1002 (> 150 days)
        {"RID": 1002, "EXAMDATE": "2018-01-01", "DXCURREN": 1},
    ])
    frame = build_manifest(["sub-1001", "sub-1002"], root,
                           tau_status_table=tau, diagnosis_table=diag)
    assert list(frame.columns) == MANIFEST_COLUMNS
    # PET: only sub-1001 has a tau-table row; MNI_2mm file selected
    pet_rows = frame.dropna(subset=["path_pet1451"])
    assert len(pet_rows) == 1
    assert "MNI_2mm" in pet_rows.iloc[0]["path_pet1451"]
    assert pet_rows.iloc[0]["label"] == "CN"
    assert pet_rows.iloc[0]["ses"] == "2018-03-01"
    # MRI: sub-1001 diagnosis 28 days away -> MCI; sub-1002 dropped (>150d)
    mri_rows = frame.dropna(subset=["path_anat"])
    assert len(mri_rows) == 1
    assert mri_rows.iloc[0]["ID"] == "sub-1001"
    assert mri_rows.iloc[0]["label"] == "MCI"
    assert "BrainExtractionMask" in mri_rows.iloc[0]["path_anat_mask"]


def test_build_manifest_with_tabular(tmp_path):
    root = _make_bids(tmp_path)
    tab = pd.DataFrame([{
        "RID": "sub-1001", "EXAMDATE": datetime(2018, 3, 15),
        "Ventricles": 1.0, "Hippocampus": 2.0, "WholeBrain": 3.0,
        "Entorhinal": 4.0, "Fusiform": 5.0, "MidTemp": 6.0, "ICV": 7.0,
        "AGE": 75.0, "PTEDUCAT": 16.0, "DX": "CN"}])
    frame = build_manifest(["sub-1001"], root, tabular_table=tab)
    tab_rows = frame.dropna(subset=["AGE"])
    assert len(tab_rows) == 1
    assert tab_rows.iloc[0]["ses"] == "2018-03-15"
    assert tab_rows.iloc[0]["label"] == "CN"


def test_count_modalities(tmp_path):
    root = _make_bids(tmp_path)
    census = count_modalities(root)
    assert len(census) == 2
    assert census["has_pet1451"].all() and census["has_anat"].all()


def test_prepare_data_cli(tmp_path):
    """tools/prepare_data.py end-to-end on a synthetic BIDS tree."""
    import subprocess
    import sys as _sys
    from datetime import datetime as _dt

    root = _make_bids(tmp_path / "bids")
    (tmp_path / "bids").mkdir(exist_ok=True)
    # minimal tables
    pd.DataFrame({
        "RID": ["sub-1001", "sub-1002"],
        "EXAMDATE": ["01/03/2018", "10/05/2019"],
        "Ventricles": [1.0, 2.0], "Hippocampus": [1.0, 2.0],
        "WholeBrain": [1.0, 2.0], "Entorhinal": [1.0, 2.0],
        "Fusiform": [1.0, 2.0], "MidTemp": [1.0, 2.0],
        "ICV": [1.0, 2.0], "AGE": [70.0, 75.0],
        "Years_bl": [1.0, 2.0], "PTEDUCAT": [16, 12],
        "DX": ["CN", "Dementia"],
    }).to_csv(tmp_path / "adni_merged.csv", index=False)
    pd.DataFrame([
        {"ID": "sub-1001", "ses": "ses-2018-03-01",
         "pet.modality": "pet-AV1451", "DX": "CN"},
    ]).to_csv(tmp_path / "tau.csv", index=False)
    pd.DataFrame([
        {"RID": 1001, "EXAMDATE": "2018-02-01", "DXCURREN": 2},
    ]).to_csv(tmp_path / "diag.csv", index=False)

    result = subprocess.run(
        [_sys.executable, "tools/prepare_data.py",
         "--adni-merged", str(tmp_path / "adni_merged.csv"),
         "--bids-root", root,
         "--tau-status", str(tmp_path / "tau.csv"),
         "--diagnosis", str(tmp_path / "diag.csv"),
         "--out-dir", str(tmp_path / "out"),
         "--split-json", str(tmp_path / "split.json")],
        capture_output=True, text=True, cwd="/root/repo")
    assert result.returncode == 0, result.stderr[-800:]
    import os as _os

    for mode in ("train", "val", "test"):
        assert _os.path.exists(
            tmp_path / "out" / f"{mode}_path_data_labels.csv")
