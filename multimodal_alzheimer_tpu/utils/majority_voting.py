"""Soft-voting ensemble across per-modality models.

Parity with the reference's (outdated but inventoried) ensemble
(reference: pkg/utils/outdated/majority_voting.py:76-295): average the
per-model softmax probability vectors, optionally weighting each model by
its validation macro-F1, and argmax the blend. Vectorized jnp instead of
the reference's per-sample Python loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def soft_vote(logits_per_model: Sequence[jnp.ndarray],
              weights: Optional[Sequence[float]] = None) -> jnp.ndarray:
    """Blend model outputs: (M x (N, C) logits) -> (N,) predictions.

    ``weights`` (e.g. per-modality val F1 scores, majority_voting.py:55-57)
    scales each model's probability vector before averaging; None means
    unweighted.
    """
    probs = jnp.stack([jax.nn.softmax(l, axis=-1)
                       for l in logits_per_model])  # (M, N, C)
    if weights is not None:
        w = jnp.asarray(weights, probs.dtype).reshape(-1, 1, 1)
        probs = probs * (w / jnp.sum(w))
    return jnp.argmax(jnp.mean(probs, axis=0), axis=-1)
