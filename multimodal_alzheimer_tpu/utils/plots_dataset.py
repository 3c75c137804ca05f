"""Dataset EDA plots + split sanity checks.

Covers the reference's notebook checks as code (reference:
notebooks_visualization/plots_dataset.py and
Sanity_Check_Data_Split.ipynb): label distributions per split, pairing
time-delta histograms, and subject-leakage verification.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def label_distribution_frame(manifests: dict) -> pd.DataFrame:
    """{'train': csv_path_or_frame, ...} -> counts per (split, label)."""
    rows = []
    for split, m in manifests.items():
        frame = pd.read_csv(m) if isinstance(m, str) else m
        for label, count in frame["label"].value_counts().items():
            rows.append({"split": split, "label": label, "count": count})
    return pd.DataFrame(rows)


def plot_label_distribution(manifests: dict, out_path: str | None = None):
    import matplotlib
    matplotlib.use("Agg")

    frame = label_distribution_frame(manifests)
    pivot = frame.pivot_table(index="label", columns="split",
                              values="count", fill_value=0)
    ax = pivot.plot.bar(rot=0, figsize=(8, 4), color=["#22418e", "#b0cffb",
                                                      "#7a99d6"])
    ax.set_ylabel("samples")
    fig = ax.get_figure()
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=200)
    return fig


def pairing_time_deltas(paired_frame: pd.DataFrame) -> np.ndarray:
    """Days between min_time and max_time per fused sample (the pairing
    window width EDA, Exploratory_Data_Analysis.ipynb)."""
    deltas = (pd.to_datetime(paired_frame["max_time"])
              - pd.to_datetime(paired_frame["min_time"]))
    return deltas.dt.days.to_numpy()


def check_no_subject_leakage(split: dict) -> None:
    """Raise if any patient ID appears in more than one split
    (Sanity_Check_Data_Split.ipynb's core assertion)."""
    seen: dict = {}
    for name, ids in split.items():
        for pid in ids:
            if pid in seen:
                raise ValueError(
                    f"subject {pid!r} leaks across splits "
                    f"{seen[pid]!r} and {name!r}")
            seen[pid] = name


def check_manifest_shapes(manifest: pd.DataFrame,
                          expected_shape=(91, 109, 91),
                          sample: int = 10) -> None:
    """Spot-check volume shapes (Image_Analysis.ipynb's assertion)."""
    from multimodal_alzheimer_tpu.data import native_io

    paths = (manifest["path_pet1451"].dropna().tolist()
             + manifest["path_anat"].dropna().tolist())[:sample]
    for p in paths:
        shape = native_io.nifti_shape(p)
        if tuple(shape) != tuple(expected_shape):
            raise ValueError(f"{p}: shape {shape} != {expected_shape}")
