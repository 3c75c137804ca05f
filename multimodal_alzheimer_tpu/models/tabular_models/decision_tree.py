"""Decision-tree tabular baseline (reference decision_tree.py parity).

Host-side sklearn model, as in the reference
(pkg/models/tabular_models/decision_tree.py:1-61): gini criterion,
max_depth 5, class weights from the label distribution. Includes the MCI
probe utility (predicting the held-out MCI class with a binary-trained
tree).
"""

from __future__ import annotations

import numpy as np


def train_decision_tree(features: np.ndarray, labels: np.ndarray,
                        class_weight: dict | None = None,
                        max_depth: int = 5):
    from sklearn.tree import DecisionTreeClassifier

    clf = DecisionTreeClassifier(criterion="gini", max_depth=max_depth,
                                 class_weight=class_weight, random_state=0)
    clf.fit(features, labels)
    return clf


def predict_mci(clf, mci_features: np.ndarray) -> np.ndarray:
    """Class fractions a binary CN/Dementia tree assigns to MCI samples."""
    preds = clf.predict(mci_features)
    return np.bincount(preds.astype(int), minlength=2) / max(len(preds), 1)
