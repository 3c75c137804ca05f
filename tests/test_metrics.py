"""Metric parity tests vs sklearn (golden values for F1/MCC/confusion)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from sklearn.metrics import (
    confusion_matrix as sk_confusion_matrix,
    f1_score as sk_f1_score,
    matthews_corrcoef as sk_mcc,
    balanced_accuracy_score as sk_bacc,
)

from multimodal_alzheimer_tpu.metrics import (
    balanced_accuracy,
    bootstrap_metric,
    confusion_matrix,
    f1_macro,
    f1_per_class,
    matthews_corrcoef,
)
from multimodal_alzheimer_tpu.metrics.classification import epoch_metrics


def _preds_labels(n=200, c=3, seed=0):
    rng = np.random.default_rng(seed)
    preds = rng.integers(0, c, size=n).astype(np.int32)
    labels = rng.integers(0, c, size=n).astype(np.int32)
    return preds, labels


@pytest.mark.parametrize("c", [2, 3])
def test_confusion_matrix_matches_sklearn(c):
    preds, labels = _preds_labels(c=c)
    ours = np.asarray(confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), c))
    theirs = sk_confusion_matrix(labels, preds, labels=list(range(c)))
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize("c", [2, 3])
def test_f1_matches_sklearn(c):
    preds, labels = _preds_labels(c=c, seed=1)
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), c)
    ours_macro = np.asarray(f1_macro(cm))
    ours_pc = np.asarray(f1_per_class(cm))
    theirs_macro = sk_f1_score(labels, preds, average="macro",
                               labels=list(range(c)), zero_division=0)
    theirs_pc = sk_f1_score(labels, preds, average=None,
                            labels=list(range(c)), zero_division=0)
    np.testing.assert_allclose(ours_macro, theirs_macro, rtol=1e-6)
    np.testing.assert_allclose(ours_pc, theirs_pc, rtol=1e-6)


def test_f1_with_absent_class():
    # class 2 never appears: torchmetrics/sklearn count it as 0 in the macro
    preds = np.array([0, 0, 1, 1], dtype=np.int32)
    labels = np.array([0, 1, 1, 0], dtype=np.int32)
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 3)
    theirs = sk_f1_score(labels, preds, average="macro", labels=[0, 1, 2],
                         zero_division=0)
    np.testing.assert_allclose(np.asarray(f1_macro(cm)), theirs, rtol=1e-6)


@pytest.mark.parametrize("c", [2, 3])
def test_mcc_matches_sklearn(c):
    preds, labels = _preds_labels(c=c, seed=2)
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), c)
    np.testing.assert_allclose(np.asarray(matthews_corrcoef(cm)),
                               sk_mcc(labels, preds), rtol=1e-5)


def test_balanced_accuracy_matches_sklearn():
    preds, labels = _preds_labels(seed=3)
    cm = confusion_matrix(jnp.asarray(preds), jnp.asarray(labels), 3)
    np.testing.assert_allclose(np.asarray(balanced_accuracy(cm)),
                               sk_bacc(labels, preds), rtol=1e-6)


def test_epoch_metrics_from_logits():
    rng = np.random.default_rng(5)
    logits = rng.normal(size=(64, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=64).astype(np.int32)
    m = epoch_metrics(jnp.asarray(logits), jnp.asarray(labels), 3)
    preds = logits.argmax(axis=1)
    np.testing.assert_allclose(
        np.asarray(m["f1"]),
        sk_f1_score(labels, preds, average="macro", labels=[0, 1, 2],
                    zero_division=0), rtol=1e-6)
    assert set(m) >= {"f1", "mcc", "balanced_accuracy", "confusion_matrix",
                      "f1_class_0", "f1_class_1", "f1_class_2"}


def test_bootstrap_statistics():
    """Bootstrap of a deterministic metric: mean matches, CI sane."""
    rng = np.random.default_rng(6)
    n = 300
    logits = rng.normal(size=(n, 3)).astype(np.float32)
    labels = logits.argmax(axis=1).astype(np.int32)  # perfect predictions
    # flip 30 labels so the metric isn't exactly 1
    labels[:30] = (labels[:30] + 1) % 3

    mean, ci = bootstrap_metric(f1_macro, jnp.asarray(logits),
                                jnp.asarray(labels), 3,
                                jax.random.PRNGKey(0), n_drawings=1000)
    point = sk_f1_score(labels, logits.argmax(axis=1), average="macro",
                        zero_division=0)
    assert abs(float(mean) - point) < 0.02
    assert 0.0 < float(ci) < 0.15


def test_bootstrap_mcc_runs():
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(100, 2)).astype(np.float32)
    labels = rng.integers(0, 2, size=100).astype(np.int32)
    mean, ci = bootstrap_metric(matthews_corrcoef, jnp.asarray(logits),
                                jnp.asarray(labels), 2,
                                jax.random.PRNGKey(1), n_drawings=200)
    assert np.isfinite(float(mean)) and np.isfinite(float(ci))
