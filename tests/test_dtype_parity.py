"""fp32-vs-fp64 loss parity (SURVEY hard part 5).

The reference computes CE on float64 logits (pet_cnn.py:65); TPU uses
fp32. Validate that fp32 loss values track fp64 closely and that
argmax/confusion matrices are identical on realistic logit scales.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from multimodal_alzheimer_tpu.losses import weighted_cross_entropy
from multimodal_alzheimer_tpu.metrics import confusion_matrix
from multimodal_alzheimer_tpu.metrics.classification import (
    predictions_from_logits,
)


def test_fp32_loss_matches_fp64_reference():
    rng = np.random.default_rng(0)
    logits = (rng.normal(size=(256, 3)) * 5).astype(np.float32)
    labels = rng.integers(0, 3, 256)
    weights = np.array([0.5, 0.3, 0.2], dtype=np.float32)

    # reference recipe: float64 logits into weighted CE
    ref = torch.nn.CrossEntropyLoss(
        weight=torch.tensor(weights, dtype=torch.double))(
        torch.tensor(logits, dtype=torch.double),
        torch.tensor(labels, dtype=torch.long))

    ours = weighted_cross_entropy(jnp.asarray(logits),
                                  jnp.asarray(labels, jnp.int32),
                                  jnp.asarray(weights))
    np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)


def test_argmax_and_confusion_identical_across_dtypes():
    rng = np.random.default_rng(1)
    logits = (rng.normal(size=(500, 3)) * 3).astype(np.float32)
    labels = rng.integers(0, 3, 500).astype(np.int32)

    preds32 = np.asarray(predictions_from_logits(jnp.asarray(logits)))
    preds64 = logits.astype(np.float64).argmax(axis=1)
    np.testing.assert_array_equal(preds32, preds64)

    cm32 = np.asarray(confusion_matrix(jnp.asarray(preds32),
                                       jnp.asarray(labels), 3))
    cm64 = np.asarray(confusion_matrix(jnp.asarray(preds64.astype(np.int32)),
                                       jnp.asarray(labels), 3))
    np.testing.assert_array_equal(cm32, cm64)
