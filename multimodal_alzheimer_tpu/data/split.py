"""Patient-level train/val/test split (reference DataSplit.py parity).

10% of patient IDs to test (seed 3551), then 10% of the remainder to val
(seed 4381) — reproducing ``pandas.Series.sample(frac=0.1, random_state=s)``
exactly so the same Adni_merged.csv yields the identical
``data_set_split.json`` (reference: pkg/utils/DataSplit.py:6-25).
"""

from __future__ import annotations

import json

import pandas as pd


def split_ids(ids: pd.Series) -> dict:
    ids = ids.drop_duplicates()
    test = ids.sample(frac=0.1, random_state=3551)
    ids = ids.drop(test.index)
    val = ids.sample(frac=0.1, random_state=4381)
    train = ids.drop(val.index)
    return {"train": train.tolist(), "val": val.tolist(),
            "test": test.tolist()}


def split_tabular(path: str, out_path: str = "data_set_split.json") -> dict:
    adni = pd.read_csv(path, low_memory=False)
    split = split_ids(adni["RID"])
    with open(out_path, "w") as f:
        json.dump(split, f)
    return split
