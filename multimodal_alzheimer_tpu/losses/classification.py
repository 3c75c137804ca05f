"""Classification losses: weighted cross-entropy and focal loss.

Numerically matches the reference's loss semantics so that training dynamics
are comparable:

* ``weighted_cross_entropy`` reproduces ``torch.nn.CrossEntropyLoss(weight=w)``
  with ``reduction='mean'``: the per-sample NLL is weighted by ``w[label]`` and
  the *sum of the applied weights* (not the batch size) is the denominator.
  Used by every reference model as the default criterion
  (reference: pkg/models/pet_models/pet_cnn.py:47-48).
* ``focal_loss`` reproduces the reference FocalLoss
  (reference: pkg/loss_functions/focalloss.py:20-40): ``-(1-p_t)^gamma *
  log p_t`` with optional per-class ``alpha`` weighting applied to the
  log-probability *after* ``p_t`` is computed, and mean (``size_average``) or
  sum reduction.

The reference computes the loss on float64 logits (pet_cnn.py:65); TPUs have
no fast fp64 path, so losses here run in float32 (accumulating the reduction
in float32). Argmax/confusion-matrix outputs are unaffected; see SURVEY.md
"hard parts" item 5.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _gather_log_probs(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-sample log p(label) from raw logits. logits: (N, C), labels: (N,)."""
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]


def weighted_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Cross entropy with optional per-class weights (torch semantics).

    Args:
      logits: (N, C) raw scores.
      labels: (N,) int class indices.
      class_weights: optional (C,) per-class weights. The reference builds
        these as ``1 - normalized_class_frequency``
        (train_pet_cnn.py:166-167).

    Returns:
      Scalar loss: ``sum_i w[y_i] * nll_i / sum_i w[y_i]`` (plain mean when
      ``class_weights`` is None).
    """
    nll = -_gather_log_probs(logits, labels)
    if class_weights is None:
        return jnp.mean(nll)
    w = jnp.asarray(class_weights, dtype=nll.dtype)[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    gamma: float = 0.0,
    alpha: Optional[jnp.ndarray] = None,
    size_average: bool = True,
) -> jnp.ndarray:
    """Focal loss ``-(1-p_t)^gamma log p_t`` (reference focalloss.py parity).

    ``alpha`` (per-class weights) multiplies ``log p_t`` *after* ``p_t`` is
    formed, exactly as the reference does; a scalar alpha expands to
    ``[alpha, 1-alpha]``.
    """
    logpt = _gather_log_probs(logits, labels)
    pt = jax.lax.stop_gradient(jnp.exp(logpt))  # reference detaches pt via .data
    if alpha is not None:
        alpha = jnp.asarray(alpha, dtype=logpt.dtype)
        if alpha.ndim == 0:
            alpha = jnp.stack([alpha, 1.0 - alpha])
        logpt = logpt * jax.lax.stop_gradient(alpha[labels])
    loss = -1.0 * (1.0 - pt) ** gamma * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


def make_criterion(hparams: dict) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Pick focal loss or weighted CE from hparams (reference model pattern).

    Mirrors the selection logic in every reference model, e.g.
    mri_models/anat_cnn.py:81-85: focal loss when ``fl_gamma`` is truthy,
    otherwise CE weighted by ``loss_class_weights``.
    """
    fl_gamma = hparams.get("fl_gamma")
    if fl_gamma:
        gamma = float(fl_gamma)

        def criterion(logits, labels):
            return focal_loss(logits, labels, gamma=gamma)

        return criterion

    weights = hparams.get("loss_class_weights")
    weights = None if weights is None else jnp.asarray(weights, jnp.float32)

    def criterion(logits, labels):
        return weighted_cross_entropy(logits, labels, weights)

    return criterion
