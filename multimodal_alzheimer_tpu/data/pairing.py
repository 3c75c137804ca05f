"""Temporal pairing expansion of multi-modal samples (vectorized).

Reproduces the reference's iterative join (reference:
pkg/utils/dataloader.py:124-156, find_corresponding_samples:347-396,
merge_two_dfs:398-436) with exact row-multiset *and ordering* semantics,
but vectorized with pandas merges instead of the O(rows^2) Python loop:

  1. The base frame is the first modality present (canonical order
     pet1451 -> t1w -> tabular, per the constructor's if-chain,
     dataloader.py:108-121). ``min_time``/``max_time`` start at ``ses``.
  2. Each subsequent modality frame joins on (ID, label), keeping rows whose
     ``ses`` is within ``days_threshold`` of the *growing* [min_time,
     max_time] window, so all fused samples are pairwise within threshold.
  3. The window expands to include the new ``ses``.
  4. NaN columns of the joined rows are filled from the base row. NOTE the
     reference fills per *column within the match group*: if ANY value in a
     column of the matched sub-frame is null and the base row has data, the
     base value overwrites the WHOLE column for that group
     (merge_two_dfs:431-435). For well-formed manifests (columns all-null
     per modality) this equals per-cell fill; we reproduce the group
     semantics exactly anyway.

Ordering: for each base row (in base order), matches append in the joined
frame's original row order — reproduced via a stable sort on
(base position, right position).
"""

from __future__ import annotations

import pandas as pd

_KEY_COLS = ("ID", "label")
_HELPER_COLS = ("__order__", "__ridx__", "ses", "min_time", "max_time")


def find_corresponding_samples(df: pd.DataFrame, id, label,
                               min_time, max_time,
                               max_days: int = 180) -> pd.DataFrame:
    """Single-row match query (reference find_corresponding_samples parity).

    Kept for API compatibility and as the oracle for the vectorized path.
    """
    df = df.loc[(df["ID"] == id) & (df["label"] == label)]
    if len(df) == 0:
        return df
    df = df.copy()
    d_min = (df["ses"] - min_time).dt.days
    d_max = (max_time - df["ses"]).dt.days
    return df.loc[(d_min <= max_days) & (d_max <= max_days)].reset_index(
        drop=True)


def merge_two_dfs(row: pd.Series, matches: pd.DataFrame) -> pd.DataFrame:
    """Merge one fused-so-far sample with its matches (reference parity)."""
    out = matches.copy()
    grow_min = (row["min_time"] - out["ses"]).dt.days > 0
    grow_max = (row["max_time"] - out["ses"]).dt.days < 0
    out["min_time"] = out["ses"].where(grow_min, row["min_time"])
    out["max_time"] = out["ses"].where(grow_max, row["max_time"])
    out = out.drop(columns=["ses"])
    row_nan = row.isna()
    for col in out.columns:
        if out[col].isnull().values.any() and not row_nan.get(col, True):
            out[col] = row[col]
    return out


def expand_pairings(frames: list[pd.DataFrame],
                    days_threshold: int = 180) -> pd.DataFrame:
    """Vectorized pairing expansion over per-modality frames.

    Args:
      frames: per-modality DataFrames in canonical modality order; each has
        ``ID``, ``label``, datetime64 ``ses``, plus data columns (all-NaN
        for other modalities' columns).
      days_threshold: max days between any two fused acquisitions.

    Returns:
      The fused frame with ``min_time``/``max_time`` columns (no ``ses``),
      row order identical to the reference's nested loop.
    """
    base = frames[0].copy()
    base["min_time"] = base["ses"]
    base["max_time"] = base["ses"]
    base = base.drop(columns="ses")
    base["__order__"] = range(len(base))

    for right_frame in frames[1:]:
        right = right_frame.copy()
        right["__ridx__"] = range(len(right))

        data_cols = [c for c in right.columns
                     if c not in _KEY_COLS and c not in _HELPER_COLS]
        merged = base.merge(right, on=list(_KEY_COLS), how="inner",
                            suffixes=("__L", ""))

        # Window filter: both distances within threshold (timedelta .days
        # floors toward -inf, matching the reference's .apply(x.days)).
        d_min = (merged["ses"] - merged["min_time"]).dt.days
        d_max = (merged["max_time"] - merged["ses"]).dt.days
        merged = merged.loc[(d_min <= days_threshold)
                            & (d_max <= days_threshold)]
        merged = merged.sort_values(["__order__", "__ridx__"],
                                    kind="stable")

        # Grow the [min_time, max_time] window (strict comparisons as in
        # merge_two_dfs:419-426).
        grow_min = (merged["min_time"] - merged["ses"]).dt.days > 0
        grow_max = (merged["max_time"] - merged["ses"]).dt.days < 0
        merged["min_time"] = merged["ses"].where(grow_min,
                                                 merged["min_time"])
        merged["max_time"] = merged["ses"].where(grow_max,
                                                 merged["max_time"])

        # Column fill with the reference's group-level semantics.
        for col in data_cols:
            left_col = col + "__L"
            if left_col not in merged.columns:
                continue
            any_null = (merged[col].isna()
                        .groupby(merged["__order__"]).transform("any"))
            take_left = any_null & merged[left_col].notna()
            merged[col] = merged[col].where(~take_left, merged[left_col])

        keep = [c for c in merged.columns
                if not c.endswith("__L") and c not in ("ses", "__ridx__")]
        base = merged[keep].reset_index(drop=True)
        base["__order__"] = range(len(base))

    return base.drop(columns="__order__", errors="ignore").reset_index(
        drop=True)
