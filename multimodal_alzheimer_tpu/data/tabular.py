"""Tabular clinical feature extraction (reference dataloader.py:291-308).

The 9-feature vector order is
``[AGE, PTEDUCAT, Ventricles, Hippocampus, WholeBrain, Entorhinal,
Fusiform, MidTemp, ICV]``.

Reference quirk (dataloader.py:301): ``whole_brain = sample['PTEDUCAT']``
duplicates the education feature instead of reading ``WholeBrain``. This is
reproduced by default for logit parity (``compat_whole_brain_bug=True``,
see SURVEY.md quirks register); pass False for the corrected behavior.
"""

from __future__ import annotations

import numpy as np

TABULAR_FEATURES = ("AGE", "PTEDUCAT", "Ventricles", "Hippocampus",
                    "WholeBrain", "Entorhinal", "Fusiform", "MidTemp", "ICV")


def tabular_vector(sample, compat_whole_brain_bug: bool = True) -> np.ndarray:
    """Build the 9-float feature vector from a manifest row (dict-like)."""
    whole_brain = (sample["PTEDUCAT"] if compat_whole_brain_bug
                   else sample["WholeBrain"])
    return np.array([
        sample["AGE"],
        sample["PTEDUCAT"],
        sample["Ventricles"],
        sample["Hippocampus"],
        whole_brain,
        sample["Entorhinal"],
        sample["Fusiform"],
        sample["MidTemp"],
        sample["ICV"],
    ], dtype=np.float32)


def tabular_matrix(df, compat_whole_brain_bug: bool = True) -> np.ndarray:
    """(N, 9) feature matrix from a manifest frame (vectorized)."""
    cols = list(TABULAR_FEATURES)
    if compat_whole_brain_bug:
        cols[4] = "PTEDUCAT"
    return df[cols].to_numpy(dtype=np.float32)
