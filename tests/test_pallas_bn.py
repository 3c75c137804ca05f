"""Fused Pallas BatchNorm vs torch BatchNorm3d (training mode, fwd+bwd)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.ops import pallas_bn


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setattr(pallas_bn, "INTERPRET", True)


def _torch_bn_train(x_ndhwc, scale, bias, gy_ndhwc, eps=1e-5):
    """torch BatchNorm3d training fwd + grads (NCDHW internally)."""
    x = torch.tensor(np.transpose(x_ndhwc, (0, 4, 1, 2, 3)),
                     requires_grad=True)
    bn = torch.nn.BatchNorm3d(x.shape[1], eps=eps)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(scale))
        bn.bias.copy_(torch.tensor(bias))
    bn.train()
    y = bn(x)
    gy = torch.tensor(np.transpose(gy_ndhwc, (0, 4, 1, 2, 3)))
    y.backward(gy)
    return (np.transpose(y.detach().numpy(), (0, 2, 3, 4, 1)),
            np.transpose(x.grad.numpy(), (0, 2, 3, 4, 1)),
            bn.weight.grad.numpy(), bn.bias.grad.numpy())


@pytest.mark.parametrize("c", [64, 128, 256])
def test_fused_bn_matches_torch(c):
    rng = np.random.default_rng(c)
    shape = (2, 4, 4, 4, c)
    x = rng.normal(size=shape).astype(np.float32) * 2 + 1
    gy = rng.normal(size=shape).astype(np.float32)
    scale = rng.normal(size=(c,)).astype(np.float32) * 0.5 + 1
    bias = rng.normal(size=(c,)).astype(np.float32)

    y_t, dx_t, dscale_t, dbias_t = _torch_bn_train(x, scale, bias, gy)

    n = int(np.prod(shape[:-1]))

    def f(x2, s, b):
        y, mean, var = pallas_bn.batch_norm_train(x2, s, b, 1e-5)
        return jnp.sum(y * gy.reshape(n, c)), y

    (loss, y), grads = jax.value_and_grad(f, argnums=(0, 1, 2),
                                          has_aux=True)(
        jnp.asarray(x.reshape(n, c)), jnp.asarray(scale),
        jnp.asarray(bias))
    dx, dscale, dbias = grads

    np.testing.assert_allclose(np.asarray(y).reshape(shape), y_t,
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dx).reshape(shape), dx_t,
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dscale), dscale_t, rtol=2e-3,
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(dbias), dbias_t, rtol=2e-3,
                               atol=1e-3)


def test_fused_bn_module_matches_flax():
    import flax.linen as nn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 4, 4, 4, 64)).astype(np.float32))

    ours = pallas_bn.FusedBatchNorm(use_running_average=False)
    theirs = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
    v1 = ours.init(jax.random.PRNGKey(0), x)
    v2 = theirs.init(jax.random.PRNGKey(0), x)
    # identical param/stat tree structure (checkpoint compatibility)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))

    y1, m1 = ours.apply(v1, x, mutable=["batch_stats"])
    y2, m2 = theirs.apply(v2, x, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-4,
                               atol=2e-4)
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(m1)[0],
            jax.tree_util.tree_flatten_with_path(m2)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(p))
    # eval mode
    y_eval1 = ours.bind(v1).__class__  # no-op; eval via apply below
    ours_eval = pallas_bn.FusedBatchNorm(use_running_average=True)
    theirs_eval = nn.BatchNorm(use_running_average=True)
    ye1 = ours_eval.apply(v1, x)
    ye2 = theirs_eval.apply(v2, x)
    np.testing.assert_allclose(np.asarray(ye1), np.asarray(ye2),
                               rtol=2e-4, atol=2e-4)


def test_hybrid_bn_matches_flax():
    """HybridBatchNorm (Pallas stats + XLA apply): fwd, stats and grads
    must match flax nn.BatchNorm."""
    import flax.linen as nn

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 4, 4, 4, 64)).astype(np.float32)
                    * 2 + 1)
    gy = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))

    ours = pallas_bn.HybridBatchNorm(use_running_average=False)
    theirs = nn.BatchNorm(use_running_average=False, momentum=0.9,
                          epsilon=1e-5)
    v1 = ours.init(jax.random.PRNGKey(0), x)
    v2 = theirs.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v1)
            == jax.tree_util.tree_structure(v2))

    def loss(module, variables, x):
        y, mut = module.apply(variables, x, mutable=["batch_stats"])
        return jnp.sum(y * gy), (y, mut)

    (l1, (y1, m1)), g1 = jax.value_and_grad(
        lambda v, x: loss(ours, v, x), argnums=(0, 1), has_aux=True)(v1, x)
    (l2, (y2, m2)), g2 = jax.value_and_grad(
        lambda v, x: loss(theirs, v, x), argnums=(0, 1), has_aux=True)(v2, x)

    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=2e-4,
                               atol=2e-4)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    # param grads (scale/bias) and input grads match
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g1)[0],
            jax.tree_util.tree_flatten_with_path(g2)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3,
                                   err_msg=jax.tree_util.keystr(p))
    # running stats updated identically
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(m1)[0],
            jax.tree_util.tree_flatten_with_path(m2)[0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(p))
