"""Pallas maxpool backward vs jax.grad of flax nn.max_pool (stem config).

The kernel (ops/pallas_maxpool.py) must reproduce XLA's SelectAndScatter
gradient exactly — including first-match-in-window tie resolution and the
per-element accumulation order of overlapping windows. Runs in Pallas
interpreter mode on the CPU test mesh; the compiled path is exercised on
real TPU hardware by the perf harness.
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.ops.pallas_maxpool import max_pool3d_pl


def _ref_pool(x):
    return nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                       padding=[(1, 1)] * 3)


def _grads(x, w=None):
    if w is None:
        ref_loss = lambda v: jnp.sum(_ref_pool(v) ** 2)
        pl_loss = lambda v: jnp.sum(max_pool3d_pl(v, True) ** 2)
    else:
        ref_loss = lambda v: jnp.sum(w * _ref_pool(v))
        pl_loss = lambda v: jnp.sum(w * max_pool3d_pl(v, True))
    return jax.grad(ref_loss)(x), jax.grad(pl_loss)(x)


@pytest.mark.parametrize("shape", [
    (2, 9, 11, 9, 4),     # odd dims, D not divisible by the block
    (1, 8, 8, 8, 3),      # even dims
    (2, 12, 10, 14, 8),   # D divisible by the block
    (1, 5, 7, 5, 2),      # tiny: single D-block with halo off both edges
])
def test_forward_and_grad_match(shape):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape)
                    .astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool3d_pl(x, True)), np.asarray(_ref_pool(x)))
    ref, got = _grads(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grad_on_relu_zero_ties():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 10, 12, 10, 8)).astype(np.float32)
    x = np.maximum(x - 0.8, 0.0)  # ~80% exact zeros -> massive ties
    ref, got = _grads(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grad_on_constant_blocks():
    rng = np.random.default_rng(3)
    x = np.round(rng.normal(size=(1, 9, 9, 9, 2)) * 2) / 2
    x[:, :4] = 1.0
    ref, got = _grads(jnp.asarray(x.astype(np.float32)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_grad_bfloat16():
    rng = np.random.default_rng(4)
    x = jnp.asarray(np.maximum(rng.normal(size=(2, 9, 11, 9, 4)), 0)
                    .astype(np.float32)).astype(jnp.bfloat16)
    ref, got = _grads(x)
    assert got.dtype == x.dtype
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32))


def test_grad_nonuniform_cotangent_under_jit():
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.maximum(rng.normal(size=(2, 9, 11, 9, 4)), 0)
                    .astype(np.float32))
    w = jnp.asarray(rng.normal(size=_ref_pool(x).shape).astype(np.float32))
    ref = jax.jit(jax.grad(lambda v: jnp.sum(w * _ref_pool(v))))(x)
    got = jax.jit(jax.grad(lambda v: jnp.sum(
        w * max_pool3d_pl(v, True))))(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
