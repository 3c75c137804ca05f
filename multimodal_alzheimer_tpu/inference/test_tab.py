"""Evaluate the tabular model (reference inference/test_tab.py, which
wraps TabPFN with hard-coded class weights :25-40; here the TabularMLP
checkpoint carries its weights in hparams).

Converted TabPFN artifacts evaluate too: a ``tabpfn_{2,3}_class`` entry
in path_config.yaml (produced by ``tools/convert_reference.py --arch
tabpfn`` from the reference's ``tabular_baseline.pth``) is re-fit
in-context on the train split — exactly how the reference reloads it
(tabular_models/dl_approach.py:67-70 ``load_model`` re-fits the
classifier on the train CSV) — then scored with the shared test
protocol (bootstrap F1/MCC CIs + confusion PNGs, base_model.py:135-239).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from multimodal_alzheimer_tpu.inference.harness import evaluate_checkpoint
from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import TabularMLP
from multimodal_alzheimer_tpu.utils.path_config import load_path_config


def _split_xy(csv_path: str, binary: bool):
    from multimodal_alzheimer_tpu.data.dataset import MultiModalDataset

    ds = MultiModalDataset(path=str(csv_path), modalities=["tabular"],
                           binary_classification=binary)
    x = np.stack([ds[i]["tabular"] for i in range(len(ds))])
    y = np.asarray([int(ds[i]["label"]) for i in range(len(ds))])
    return x.astype(np.float32), y


def evaluate_tabpfn(checkpoint_path: str, experiment_name: str,
                    n_classes: int, ensemble_size: int = 4,
                    n_bootstrap: int = 1000, out_dir: str | None = None,
                    train_csv: str | None = None,
                    test_csv: str | None = None) -> dict:
    """Test-protocol evaluation of a converted TabPFN transformer."""
    from multimodal_alzheimer_tpu.metrics.bootstrap import bootstrap_metric
    from multimodal_alzheimer_tpu.metrics.classification import (
        confusion_matrix, f1_macro, matthews_corrcoef,
        predictions_from_logits)
    from multimodal_alzheimer_tpu.models.tabular_models.tabpfn import (
        TabPFNClassifier, model_from_variables)
    from multimodal_alzheimer_tpu.train.checkpoint import load_checkpoint
    from multimodal_alzheimer_tpu.train.loop import LABEL_NAMES

    variables, hparams, _ = load_checkpoint(checkpoint_path)
    paths = load_path_config()
    train_csv = train_csv or str(paths["train_set_csv"])
    test_csv = test_csv or str(paths["test_set_csv"])
    binary = n_classes == 2
    x_tr, y_tr = _split_xy(train_csv, binary)
    x_te, y_te = _split_xy(test_csv, binary)

    clf = TabPFNClassifier(variables=variables,
                           model=model_from_variables(variables),
                           ensemble_size=ensemble_size)
    clf.fit(x_tr, y_tr)
    if len(clf.classes_) != n_classes:
        raise ValueError(f"train split has {len(clf.classes_)} classes, "
                         f"expected {n_classes}")
    probs = clf.predict_proba(x_te)
    logits = np.log(np.maximum(probs, 1e-9))  # argmax-equivalent

    rng = jax.random.PRNGKey(5)
    f1_rng, mcc_rng = jax.random.split(rng)
    f1_mean, f1_ci = bootstrap_metric(f1_macro, logits, y_te, n_classes,
                                      f1_rng, n_bootstrap)
    mcc_mean, mcc_ci = bootstrap_metric(matthews_corrcoef, logits, y_te,
                                        n_classes, mcc_rng, n_bootstrap)
    preds = predictions_from_logits(logits)
    cm = np.asarray(confusion_matrix(preds, y_te, n_classes))
    scalars = {
        "test_f1_epoch": float(np.asarray(f1_macro(cm))),
        "test_f1_epoch_boot": float(f1_mean),
        "test_f1_epoch_ci": float(f1_ci),
        "test_mcc_epoch_boot": float(mcc_mean),
        "test_mcc_epoch_ci": float(mcc_ci),
        "tabular_baseline_F1": float(hparams.get("tabular_baseline_F1",
                                                 float("nan"))),
    }
    if out_dir is not None:
        from multimodal_alzheimer_tpu.metrics.confusion_plot import (
            save_confusion_matrix_pngs)

        os.makedirs(out_dir, exist_ok=True)
        save_confusion_matrix_pngs(cm, LABEL_NAMES[n_classes], out_dir)
        print(experiment_name, scalars)
    return scalars


def main():
    paths = load_path_config()
    for key, name in (("tabular_mlp_2_class", "test_set_tab_2_class"),
                      ("tabular_mlp_3_class", "test_set_tab_3_class")):
        if key in paths:
            metrics = evaluate_checkpoint(
                TabularMLP.from_hparams, str(paths[key]), name)
            print(key, metrics)
    for key, n_classes in (("tabpfn_2_class", 2), ("tabpfn_3_class", 3)):
        if key in paths:
            metrics = evaluate_tabpfn(str(paths[key]),
                                      f"test_set_tabpfn_{n_classes}_class",
                                      n_classes)
            print(key, metrics)


if __name__ == "__main__":
    main()
