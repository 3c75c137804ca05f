"""Loss parity tests vs torch (the reference's loss implementations)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from multimodal_alzheimer_tpu.losses import (
    focal_loss,
    make_criterion,
    weighted_cross_entropy,
)


def _rand_logits_labels(n=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(n, c)).astype(np.float32) * 3.0
    labels = rng.integers(0, c, size=(n,)).astype(np.int32)
    return logits, labels


@pytest.mark.parametrize("n_classes", [2, 3])
def test_weighted_ce_matches_torch(n_classes):
    logits, labels = _rand_logits_labels(c=n_classes)
    weights = np.array([0.7, 0.2, 0.1][:n_classes], dtype=np.float32)

    ours = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                  jnp.asarray(weights))
    theirs = torch.nn.CrossEntropyLoss(weight=torch.tensor(weights))(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5)


def test_unweighted_ce_matches_torch():
    logits, labels = _rand_logits_labels()
    ours = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    theirs = F.cross_entropy(torch.tensor(logits),
                             torch.tensor(labels, dtype=torch.long))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), rtol=1e-5)


def _torch_focal(logits, labels, gamma, alpha=None, size_average=True):
    """Oracle re-implementation of reference focalloss.py:20-40 semantics."""
    input = torch.tensor(logits)
    target = torch.tensor(labels, dtype=torch.long).view(-1, 1)
    logpt = F.log_softmax(input, dim=1)
    logpt = logpt.gather(1, target).view(-1)
    pt = logpt.data.exp()
    if alpha is not None:
        at = torch.tensor(alpha).gather(0, target.data.view(-1))
        logpt = logpt * at
    loss = -1 * (1 - pt) ** gamma * logpt
    return (loss.mean() if size_average else loss.sum()).numpy()


@pytest.mark.parametrize("gamma", [0.0, 1.0, 2.0, 5.0])
def test_focal_loss_matches_reference_semantics(gamma):
    logits, labels = _rand_logits_labels(seed=int(gamma))
    ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=gamma)
    theirs = _torch_focal(logits, labels, gamma)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5)


def test_focal_loss_alpha_and_sum():
    logits, labels = _rand_logits_labels(c=3, seed=7)
    alpha = np.array([0.2, 0.3, 0.5], dtype=np.float32)
    ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0,
                      alpha=jnp.asarray(alpha), size_average=False)
    theirs = _torch_focal(logits, labels, 2.0, alpha=alpha, size_average=False)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5)


def test_make_criterion_selection():
    logits, labels = _rand_logits_labels()
    # fl_gamma truthy -> focal loss
    crit = make_criterion({"fl_gamma": 2, "loss_class_weights": [1.0, 1.0, 1.0]})
    expected = focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0)
    np.testing.assert_allclose(
        np.asarray(crit(jnp.asarray(logits), jnp.asarray(labels))),
        np.asarray(expected))
    # fl_gamma None -> weighted CE (reference: anat_cnn.py:81-85)
    w = [0.5, 0.2, 0.3]
    crit = make_criterion({"fl_gamma": None, "loss_class_weights": w})
    expected = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                      jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(crit(jnp.asarray(logits), jnp.asarray(labels))),
        np.asarray(expected))


def test_focal_gradient_flows_only_through_logpt():
    """pt is detached in the reference (Variable(logpt.data.exp()))."""
    import jax

    logits, labels = _rand_logits_labels(n=8, c=3, seed=3)
    g_ours = jax.grad(
        lambda l: focal_loss(l, jnp.asarray(labels), gamma=2.0))(
            jnp.asarray(logits))

    t_logits = torch.tensor(logits, requires_grad=True)
    target = torch.tensor(labels, dtype=torch.long).view(-1, 1)
    logpt = F.log_softmax(t_logits, dim=1).gather(1, target).view(-1)
    pt = logpt.data.exp()
    loss = (-1 * (1 - pt) ** 2.0 * logpt).mean()
    loss.backward()
    np.testing.assert_allclose(np.asarray(g_ours), t_logits.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
