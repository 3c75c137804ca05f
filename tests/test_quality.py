"""Serve-path quality harness (inference/quality.py + the labeled
synthetic generator): dataset-level F1/MCC/agreement comparison of
serving cores — the machinery behind tools/quality_eval.py."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.data.synthetic import (
    ArrayDataset,
    make_labeled_volumes,
)
from multimodal_alzheimer_tpu.inference.quality import (
    compare_serve_cores,
    evaluate_serve,
    format_comparison,
)


def test_make_labeled_volumes_signal_survives_normalization():
    """The class slab must stay bright AFTER per-scan min-max (the
    production preprocessing would erase a global mean shift)."""
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )

    data = make_labeled_volumes(12, (12, 14, 12), seed=0, contrast=0.8)
    normed = np.asarray(batched_normalize_mri(
        jnp.asarray(data["mri"]), jnp.asarray(data["mri_mask"]),
        {"per_scan_norm": "min_max"}, 0.99))
    slabs = np.array_split(np.arange(12), 3)
    for i, k in enumerate(data["label"]):
        own = normed[i, slabs[k]].mean()
        others = np.concatenate(
            [normed[i, slabs[j]].ravel() for j in range(3) if j != k])
        assert own > others.mean() + 0.1, (i, k, own, others.mean())


def test_make_labeled_volumes_modalities():
    data = make_labeled_volumes(6, (10, 10, 10), seed=1,
                                modalities=("mri", "pet1451", "tabular"))
    assert set(data) == {"label", "mri", "mri_mask", "pet1451", "tabular"}
    assert data["tabular"].shape == (6, 9)
    ds = ArrayDataset(data)
    assert len(ds) == 6
    assert ds[2]["mri"].shape == (10, 10, 10)


def _tab_core(variables, model):
    def serve(batch):
        out = model.apply(variables, batch, train=False)
        logits = out["logits"].astype(jnp.float32)
        return {"logits": logits, "probs": jax.nn.softmax(logits, -1)}
    return serve


def test_compare_serve_cores_contract():
    from multimodal_alzheimer_tpu.models import TabularMLP

    data = make_labeled_volumes(40, (4, 4, 4), seed=2,
                                modalities=("tabular",))
    data = {"tabular": data["tabular"], "label": data["label"]}
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16,)})
    v1 = model.init(jax.random.PRNGKey(0),
                    {"tabular": data["tabular"][:2]}, train=False)
    v2 = model.init(jax.random.PRNGKey(7),
                    {"tabular": data["tabular"][:2]}, train=False)

    res = compare_serve_cores(
        {"float": _tab_core(v1, model), "same": _tab_core(v1, model),
         "other": _tab_core(v2, model)}, data, 3, batch_size=8)

    # identical core: zero deltas, full agreement, zero prob error
    assert res["same"]["agreement"] == 1.0
    assert res["same"]["delta_f1"] == 0.0
    assert res["same"]["max_prob_abs_err"] == 0.0
    # a different model must register as drift
    assert res["other"]["max_prob_abs_err"] > 0.0
    # tail dropped to the fixed compiled batch
    assert res["float"]["n"] == 40
    assert res["float"]["confusion"].sum() == 40
    table = format_comparison(res)
    assert "agree" in table and "same" in table


def test_evaluate_serve_perfect_core_scores_one():
    """A core that reads the label scores F1=MCC=1 — pins the metric
    wiring (labels stripped from the model batch, order preserved)."""
    data = {"tabular": np.zeros((16, 3), np.float32),
            "label": np.arange(16, dtype=np.int32) % 3}
    data["tabular"][np.arange(16), data["label"]] = 5.0

    def oracle(batch):
        logits = batch["tabular"]
        assert "label" not in batch
        return {"logits": logits, "probs": jax.nn.softmax(logits, -1)}

    r = evaluate_serve(oracle, data, 3, batch_size=8)
    assert r["f1"] == 1.0 and r["mcc"] == 1.0, r


def test_evaluate_serve_small_and_empty_sets():
    """ADVICE r4 #3: an eval set smaller than the batch shrinks the
    batch (no samples dropped); an empty set raises a clear error."""
    import pytest

    data = {"tabular": np.zeros((5, 3), np.float32),
            "label": np.arange(5, dtype=np.int32) % 3}
    data["tabular"][np.arange(5), data["label"]] = 5.0

    def oracle(batch):
        logits = batch["tabular"]
        return {"logits": logits, "probs": jax.nn.softmax(logits, -1)}

    r = evaluate_serve(oracle, data, 3, batch_size=32)
    assert r["n"] == 5 and r["f1"] == 1.0

    empty = {"tabular": np.zeros((0, 3), np.float32),
             "label": np.zeros((0,), np.int32)}
    with pytest.raises(ValueError, match="empty eval set"):
        evaluate_serve(oracle, empty, 3, batch_size=8)


def test_bootstrap_cis_and_paired_deltas():
    """VERDICT r4 #3: quality rows carry bootstrap CIs. Pins: (a) CI
    present and sane (positive, < 1 for a noisy core, shrinks ~sqrt(n));
    (b) an identical core's paired delta CI is exactly 0 (shared draw
    indices make every delta draw 0 — the point of pairing); (c) a
    genuinely different core gets a nonzero delta CI."""
    from multimodal_alzheimer_tpu.models import TabularMLP

    data = make_labeled_volumes(96, (4, 4, 4), seed=5,
                                modalities=("tabular",))
    data = {"tabular": data["tabular"], "label": data["label"]}
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16,)})
    v1 = model.init(jax.random.PRNGKey(0),
                    {"tabular": data["tabular"][:2]}, train=False)
    v2 = model.init(jax.random.PRNGKey(7),
                    {"tabular": data["tabular"][:2]}, train=False)

    res = compare_serve_cores(
        {"float": _tab_core(v1, model), "same": _tab_core(v1, model),
         "other": _tab_core(v2, model)}, data, 3, batch_size=16,
        bootstrap=300)
    for r in res.values():
        assert 0 < r["f1_ci"] < 1
        assert 0 < r["mcc_ci"]
    assert res["same"]["delta_f1_ci"] == 0.0
    assert res["same"]["delta_mcc_ci"] == 0.0
    assert res["other"]["delta_f1_ci"] > 0
    table = format_comparison(res)
    assert "±" in table and "Δf1±ci" in table

    # CI shrinks roughly like sqrt(n): quadruple the set, expect a
    # clearly smaller interval (loose factor to stay un-flaky)
    small = {k: v[:24] for k, v in data.items()}
    r_small = evaluate_serve(_tab_core(v1, model), small, 3,
                             batch_size=8, bootstrap=300)
    r_big = evaluate_serve(_tab_core(v1, model), data, 3,
                           batch_size=8, bootstrap=300)
    assert r_big["f1_ci"] < r_small["f1_ci"]
