"""Performance comparison plots (reference plot_performance.py parity).

Bar charts of bootstrap F1 / MCC with CI error bars per model from a
scores CSV with columns ``model, f1, f1_ci, mcc, mcc_ci`` (the reference
reads ``data/{2,3}_class_scores.csv``,
reference: notebooks_visualization/plot_performance.py:22-24, 59-344).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def plot_scores(scores: pd.DataFrame, metric: str = "f1",
                title: str = "", out_path: str | None = None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ci_col = f"{metric}_ci"
    fig, ax = plt.subplots(figsize=(10, 5))
    x = np.arange(len(scores))
    ax.bar(x, scores[metric],
           yerr=scores[ci_col] if ci_col in scores else None,
           capsize=4, color="#22418e")
    ax.set_xticks(x)
    ax.set_xticklabels(scores["model"], rotation=30, ha="right")
    ax.set_ylabel(metric.upper())
    ax.set_ylim(0, 1)
    ax.set_title(title)
    fig.tight_layout()
    if out_path:
        fig.savefig(out_path, dpi=200)
    return fig


def collect_scores(metric_dicts: dict) -> pd.DataFrame:
    """{model_name: trainer.test(...) metrics} -> scores frame."""
    rows = []
    for name, m in metric_dicts.items():
        rows.append({
            "model": name,
            "f1": m.get("test_f1_epoch_boot", m.get("test_f1_epoch")),
            "f1_ci": m.get("test_f1_epoch_ci", 0.0),
            "mcc": m.get("test_mcc_epoch_boot"),
            "mcc_ci": m.get("test_mcc_epoch_ci", 0.0),
        })
    return pd.DataFrame(rows)
