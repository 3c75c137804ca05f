"""Jittable classification metrics built from confusion matrices.

Replaces the reference's torchmetrics usage (reference:
pkg/models/base_model.py:21-32 tracks macro and per-class MulticlassF1Score;
test_epoch_end adds MulticlassMatthewsCorrCoef). Everything here is a pure
function of (predictions, labels) so it composes with ``jax.jit`` / ``vmap``;
there is no stateful metric accumulation — epoch metrics are computed from a
single confusion-matrix reduction over the epoch's outputs.

Conventions (torchmetrics-compatible):
  * confusion matrix rows = true class, columns = predicted class,
  * per-class F1 = 2TP / (2TP + FP + FN), 0 when the denominator is 0,
  * macro F1 averages over *all* classes, including absent ones,
  * multiclass MCC via the covariance form; 0 when the denominator is 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def predictions_from_logits(logits: jnp.ndarray) -> jnp.ndarray:
    """argmax over the class axis (reference: confusion_matrix.py:85)."""
    return jnp.argmax(logits, axis=-1)


def confusion_matrix(preds: jnp.ndarray, labels: jnp.ndarray, n_classes: int,
                     weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """(n_classes, n_classes) count matrix; rows true, cols predicted.

    ``weights`` (optional, same shape as preds) lets the bootstrap path count
    resampled duplicates without gathers.
    """
    idx = labels * n_classes + preds
    if weights is None:
        weights = jnp.ones_like(idx, dtype=jnp.float32)
    flat = jnp.zeros((n_classes * n_classes,), dtype=jnp.float32)
    flat = flat.at[idx].add(weights)
    return flat.reshape(n_classes, n_classes)


def f1_per_class(cm: jnp.ndarray) -> jnp.ndarray:
    """Per-class F1 from a confusion matrix."""
    tp = jnp.diagonal(cm)
    fn = jnp.sum(cm, axis=1) - tp
    fp = jnp.sum(cm, axis=0) - tp
    denom = 2.0 * tp + fp + fn
    return jnp.where(denom > 0, 2.0 * tp / jnp.where(denom > 0, denom, 1.0), 0.0)


def f1_macro(cm: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(f1_per_class(cm))


def matthews_corrcoef(cm: jnp.ndarray) -> jnp.ndarray:
    """Multiclass MCC (covariance form) from a confusion matrix."""
    t = jnp.sum(cm, axis=1)  # true counts per class
    p = jnp.sum(cm, axis=0)  # predicted counts per class
    c = jnp.trace(cm)
    s = jnp.sum(cm)
    cov_ytyp = c * s - jnp.dot(t, p)
    cov_ypyp = s * s - jnp.dot(p, p)
    cov_ytyt = s * s - jnp.dot(t, t)
    denom = jnp.sqrt(cov_ytyt * cov_ypyp)
    return jnp.where(denom > 0, cov_ytyp / jnp.where(denom > 0, denom, 1.0), 0.0)


def balanced_accuracy(cm: jnp.ndarray) -> jnp.ndarray:
    """Mean per-class recall (the BASELINE.json parity metric)."""
    support = jnp.sum(cm, axis=1)
    recall = jnp.where(support > 0,
                       jnp.diagonal(cm) / jnp.where(support > 0, support, 1.0),
                       0.0)
    n_present = jnp.sum(support > 0)
    return jnp.sum(recall) / jnp.maximum(n_present, 1)


def epoch_metrics(logits: jnp.ndarray, labels: jnp.ndarray, n_classes: int) -> dict:
    """Macro + per-class F1 and the confusion matrix for one epoch's outputs.

    Equivalent of Base_Model.*_epoch_end metric aggregation
    (reference: base_model.py:91-133) as one jittable function.
    """
    preds = predictions_from_logits(logits)
    cm = confusion_matrix(preds, labels, n_classes)
    per_class = f1_per_class(cm)
    out = {
        "f1": jnp.mean(per_class),
        "mcc": matthews_corrcoef(cm),
        "balanced_accuracy": balanced_accuracy(cm),
        "confusion_matrix": cm,
    }
    for i in range(n_classes):
        out[f"f1_class_{i}"] = per_class[i]
    return out
