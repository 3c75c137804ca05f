"""Manifest builder: BIDS tree + clinical CSVs -> per-split manifest CSVs.

Reimplements the semantics of the reference's offline provisioning script
(reference: pkg/utils/create_csv/data_labels.py) with configurable roots
instead of hard-coded lab paths (:130-135, :168):

  * PET rows: per (subject, 'pet-AV1451', session) keep only the MNI_2mm
    file (:190); label joined from the tau/amyloid status table by
    (ID, ses, modality) (:197-199).
  * MRI rows: keep only 'reg_ants2_MNI_2mm' files (:224) plus the ANTs
    brain mask path (:227); label = diagnosis row with the smallest
    |date delta| if < 150 days (THRESHOLD_DAYS_MRI, :149, :251), mapped via
    the DXCURREN/DXCHANGE/DIAGNOSIS code table (``get_diag``, :95-126).
  * Tabular rows: the merged ADNI table filtered to split IDs, AGE
    corrected by Years_bl (:136), rows with any NaN dropped (:144).

Output columns per data_labels.py:11-19; one row per single-modality
sample; ``ses`` formatted %Y-%m-%d.
"""

from __future__ import annotations

import json
import os
from datetime import datetime
from typing import Optional, Tuple

import numpy as np
import pandas as pd

THRESHOLD_DAYS_MRI = 150

MANIFEST_COLUMNS = [
    "ID", "ses", "path_pet1451", "path_anat", "path_anat_mask",
    "AGE", "PTEDUCAT", "Ventricles", "Hippocampus", "WholeBrain",
    "Entorhinal", "Fusiform", "MidTemp", "ICV", "label",
]

RELEVANT_FEATS_TAB = ["RID", "EXAMDATE", "Ventricles", "Hippocampus",
                      "WholeBrain", "Entorhinal", "Fusiform", "MidTemp",
                      "ICV", "AGE", "Years_bl", "PTEDUCAT", "DX"]


def get_timedelta_from_string(timestring: str,
                              format: str = "ses-%Y-%m-%d") -> datetime:
    return datetime.strptime(timestring, format)


def get_rid_from_id(id_string: str) -> int:
    """Patient RID = int of the ID string's last 4 chars
    (data_labels.py:50-62)."""
    return int(id_string[-4:])


def find_closest_timestamp(date: datetime, df: pd.DataFrame,
                           col_name: str = "EXAMDATE") -> Tuple[int, int]:
    """(days, row index) of the diagnosis nearest in time
    (data_labels.py:64-93)."""
    df_date = df.dropna(subset=[col_name]).copy()
    dates = df_date[col_name].map(
        lambda x: datetime.strptime(x, "%Y-%m-%d")
        if isinstance(x, str) else x)
    diff = (date - dates).map(lambda x: abs(int(x.days)))
    return int(diff.min()), diff.idxmin()


def get_diag(row) -> str:
    """ADNI diagnosis codes -> CN/MCI/Dementia (data_labels.py:95-126)."""
    def eq(col, v):
        return col in row and row[col] == v

    if (eq("DXCURREN", 1) or eq("DXCHANGE", 1) or eq("DXCHANGE", 7)
            or eq("DXCHANGE", 9) or eq("DIAGNOSIS", 1)):
        return "CN"
    if (eq("DXCURREN", 2) or eq("DXCHANGE", 2) or eq("DXCHANGE", 4)
            or eq("DXCHANGE", 8) or eq("DIAGNOSIS", 2)):
        return "MCI"
    if (eq("DXCURREN", 3) or eq("DXCHANGE", 3) or eq("DXCHANGE", 5)
            or eq("DXCHANGE", 6) or eq("DIAGNOSIS", 3)):
        return "Dementia"
    return "not defined"


def load_tabular_table(adni_merged_csv: str) -> pd.DataFrame:
    """Adni_merged.csv -> cleaned tabular frame (data_labels.py:134-145)."""
    f_tab = pd.read_csv(adni_merged_csv, low_memory=False,
                        usecols=RELEVANT_FEATS_TAB)
    f_tab["AGE"] = f_tab["AGE"] + f_tab["Years_bl"]
    f_tab = f_tab.drop(columns="Years_bl")
    f_tab["EXAMDATE"] = f_tab["EXAMDATE"].map(
        lambda x: datetime.strptime(x, "%d/%m/%Y"))
    return f_tab.dropna()


def build_manifest(split_ids: list,
                   bids_root: str,
                   tau_status_table: Optional[pd.DataFrame] = None,
                   diagnosis_table: Optional[pd.DataFrame] = None,
                   tabular_table: Optional[pd.DataFrame] = None,
                   ) -> pd.DataFrame:
    """One split's manifest frame (the body of data_labels.py's loop)."""
    rows = []
    n_missing_pet = n_missing_anat = 0

    for subject in sorted(os.listdir(bids_root)):
        if subject not in split_ids:
            continue
        subject_path = os.path.join(bids_root, subject)
        modalities = os.listdir(subject_path)

        if "pet-AV1451" in modalities and tau_status_table is not None:
            base = os.path.join(subject_path, "pet-AV1451")
            for session in [s for s in os.listdir(base) if "ses" in s]:
                ses_path = os.path.join(base, session)
                files = [f for f in os.listdir(ses_path) if "MNI_2mm" in f]
                if len(files) != 1:
                    continue
                filt = ((tau_status_table["ID"] == subject)
                        & (tau_status_table["ses"] == session)
                        & (tau_status_table["pet.modality"]
                           == "pet-AV1451"))
                label = tau_status_table[filt]["DX"]
                if len(label) == 0:
                    n_missing_pet += 1
                    continue
                rows.append({
                    "ID": subject,
                    "ses": get_timedelta_from_string(session),
                    "path_pet1451": os.path.join(ses_path, files[0]),
                    "label": label.iloc[0],
                })

        if "anat" in modalities and diagnosis_table is not None:
            base = os.path.join(subject_path, "anat")
            for session in [s for s in os.listdir(base) if "ses" in s]:
                ses_path = os.path.join(base, session)
                files = [f for f in os.listdir(ses_path)
                         if "reg_ants2_MNI_2mm" in f]
                mask_path = os.path.join(
                    ses_path,
                    "antsCorticalThickness/"
                    "BrainExtractionMask_ants2_MNI_2mm.nii.gz")
                if len(files) != 1:
                    continue
                session_date = get_timedelta_from_string(session)
                rid = get_rid_from_id(subject)
                df_subject = diagnosis_table.loc[
                    diagnosis_table["RID"] == rid]
                if df_subject.empty:
                    n_missing_anat += 1
                    continue
                days, idx = find_closest_timestamp(session_date, df_subject)
                if days >= THRESHOLD_DAYS_MRI:
                    n_missing_anat += 1
                    continue
                rows.append({
                    "ID": subject,
                    "ses": session_date,
                    "path_anat": os.path.join(ses_path, files[0]),
                    "path_anat_mask": mask_path,
                    "label": get_diag(df_subject.loc[idx]),
                })

    frame = pd.DataFrame(rows)
    if tabular_table is not None:
        tab = tabular_table[tabular_table["RID"].isin(split_ids)].rename(
            columns={"RID": "ID", "EXAMDATE": "ses", "DX": "label"})
        frame = pd.concat([frame, tab], ignore_index=True)
    if len(frame):
        frame["ses"] = frame["ses"].map(
            lambda d: d.strftime("%Y-%m-%d") if hasattr(d, "strftime")
            else d)
    for col in MANIFEST_COLUMNS:
        if col not in frame.columns:
            frame[col] = np.nan
    return frame[MANIFEST_COLUMNS]


def build_split_manifests(split_json: str, bids_root: str, out_dir: str,
                          tau_status_csv: Optional[str] = None,
                          diagnosis_csv: Optional[str] = None,
                          adni_merged_csv: Optional[str] = None) -> dict:
    """Write data/{train,val,test}_path_data_labels.csv
    (data_labels.py:156-274)."""
    with open(split_json) as f:
        split = json.load(f)
    tau = (pd.read_csv(tau_status_csv, low_memory=False)
           if tau_status_csv else None)
    diag = (pd.read_csv(diagnosis_csv, low_memory=False)
            if diagnosis_csv else None)
    tab = load_tabular_table(adni_merged_csv) if adni_merged_csv else None

    os.makedirs(out_dir, exist_ok=True)
    out = {}
    for mode in ("train", "val", "test"):
        frame = build_manifest(split[mode], bids_root, tau, diag, tab)
        path = os.path.join(out_dir, f"{mode}_path_data_labels.csv")
        frame.to_csv(path, index=False)
        out[mode] = path
    return out


def count_modalities(bids_root: str) -> pd.DataFrame:
    """Modality availability census per subject
    (create_csv/count_modalities.py parity)."""
    rows = []
    for subject in sorted(os.listdir(bids_root)):
        subject_path = os.path.join(bids_root, subject)
        if not os.path.isdir(subject_path):
            continue
        mods = set(os.listdir(subject_path))
        rows.append({"ID": subject,
                     "has_pet1451": "pet-AV1451" in mods,
                     "has_anat": "anat" in mods})
    return pd.DataFrame(rows)
