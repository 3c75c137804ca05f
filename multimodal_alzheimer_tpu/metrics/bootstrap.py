"""Vectorized bootstrap confidence intervals for classification metrics.

The reference draws 1000 resamples in a Python loop, recomputing a
torchmetrics object per draw (reference: pkg/models/base_model.py:219-239) —
a CPU-bound metric loop. On TPU the whole thing is one ``vmap``: draw a
(n_draws, n) index matrix, build all confusion matrices in parallel, and
reduce. CI is 1.96 * std (std with Bessel's correction, matching
``torch.std``'s default unbiased estimator).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.metrics.classification import (
    confusion_matrix,
    predictions_from_logits,
)


@partial(jax.jit, static_argnames=("metric_fn", "n_classes", "n_drawings"))
def bootstrap_metric(
    metric_fn: Callable[[jnp.ndarray], jnp.ndarray],
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    n_classes: int,
    key: jax.Array,
    n_drawings: int = 1000,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Bootstrap mean and 1.96*std CI of a confusion-matrix metric.

    Args:
      metric_fn: cm -> scalar (e.g. ``f1_macro`` or ``matthews_corrcoef``).
      logits: (N, C) model outputs for the full evaluation set.
      labels: (N,) int labels.
      n_classes: number of classes.
      key: PRNG key (the reference uses torch.randint; draws here are JAX
        PRNG — distributionally identical resampling with replacement).
      n_drawings: number of bootstrap resamples (reference default 1000).

    Returns:
      (mean, ci) scalars.
    """
    preds = predictions_from_logits(logits)
    n = preds.shape[0]
    idx = jax.random.randint(key, (n_drawings, n), 0, n)

    def one_draw(sample_idx):
        cm = confusion_matrix(preds[sample_idx], labels[sample_idx], n_classes)
        return metric_fn(cm)

    values = jax.vmap(one_draw)(idx)
    mean = jnp.mean(values)
    std = jnp.std(values, ddof=1)
    return mean, 1.96 * std
