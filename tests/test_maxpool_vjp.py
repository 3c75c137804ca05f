"""Scatter-free maxpool VJP parity vs jax.grad of flax nn.max_pool.

The custom backward must match XLA's SelectAndScatter gradient exactly —
including single-winner tie resolution (first matching element in
ascending window order), which matters because post-ReLU feature maps are
full of equal zeros (VERDICT round-1 item 3: "mind relu-zero ties").
"""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.ops.maxpool import (
    max_pool3d,
    max_pool3d_sf,
    max_pool3d_wf,
)

STEM = dict(window=(3, 3, 3), strides=(2, 2, 2), padding=((1, 1),) * 3)
HEAD = dict(window=(2, 2, 2), strides=(2, 2, 2), padding=((0, 0),) * 3)

# Both custom backwards must match SelectAndScatter: the claim-chain (sf)
# and the chain-free winner-offset (wf) formulations.
IMPLS = [max_pool3d_sf, max_pool3d_wf]
IMPL_IDS = ["sf", "wf"]


def _ref_pool(x, window, strides, padding):
    return nn.max_pool(x, window, strides=strides, padding=padding)


def _grads(x, cfg, pool=max_pool3d_sf):
    ref = jax.grad(lambda v: jnp.sum(
        _ref_pool(v, cfg["window"], cfg["strides"], cfg["padding"]) ** 2))(x)
    got = jax.grad(lambda v: jnp.sum(
        pool(v, cfg["window"], cfg["strides"], cfg["padding"]) ** 2))(x)
    return ref, got


@pytest.mark.parametrize("pool", IMPLS, ids=IMPL_IDS)
@pytest.mark.parametrize("cfg", [STEM, HEAD], ids=["stem_3s2p1", "head_2s2"])
@pytest.mark.parametrize("shape", [(2, 9, 11, 9, 4), (1, 8, 8, 8, 3)])
def test_forward_matches_flax(cfg, shape, pool):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape)
                    .astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(pool(x, cfg["window"], cfg["strides"],
                        cfg["padding"])),
        np.asarray(_ref_pool(x, cfg["window"], cfg["strides"],
                             cfg["padding"])))


@pytest.mark.parametrize("pool", IMPLS, ids=IMPL_IDS)
@pytest.mark.parametrize("cfg", [STEM, HEAD], ids=["stem_3s2p1", "head_2s2"])
def test_grad_matches_on_random_input(cfg, pool):
    x = jnp.asarray(np.random.default_rng(1)
                    .normal(size=(2, 9, 11, 9, 4)).astype(np.float32))
    ref, got = _grads(x, cfg, pool)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("pool", IMPLS, ids=IMPL_IDS)
@pytest.mark.parametrize("cfg", [STEM, HEAD], ids=["stem_3s2p1", "head_2s2"])
def test_grad_matches_on_relu_zero_ties(cfg, pool):
    """Post-ReLU maps: most entries equal zero -> massive in-window ties."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 10, 12, 10, 8)).astype(np.float32)
    x = np.maximum(x - 0.8, 0.0)  # ~80% exact zeros
    ref, got = _grads(jnp.asarray(x), cfg, pool)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("pool", IMPLS, ids=IMPL_IDS)
@pytest.mark.parametrize("cfg", [STEM, HEAD], ids=["stem_3s2p1", "head_2s2"])
def test_grad_matches_on_quantized_and_constant(cfg, pool):
    """Coarse quantization + all-equal blocks: every window ties."""
    rng = np.random.default_rng(3)
    x = np.round(rng.normal(size=(1, 9, 9, 9, 2)) * 2) / 2
    x[:, :4] = 1.0  # constant region
    ref, got = _grads(jnp.asarray(x.astype(np.float32)), cfg, pool)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("pool", IMPLS, ids=IMPL_IDS)
def test_grad_matches_in_bfloat16(pool):
    rng = np.random.default_rng(4)
    x = jnp.asarray(np.maximum(rng.normal(size=(2, 9, 11, 9, 4)), 0)
                    .astype(np.float32)).astype(jnp.bfloat16)
    ref, got = _grads(x, STEM, pool)
    assert got.dtype == x.dtype
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32))


@pytest.mark.parametrize("pool", IMPLS, ids=IMPL_IDS)
def test_grad_under_jit_and_nonuniform_cotangent(pool):
    """Weighted loss -> non-constant incoming gradient per window."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(np.maximum(rng.normal(size=(2, 9, 11, 9, 4)), 0)
                    .astype(np.float32))
    w_shape = _ref_pool(x, **STEM).shape
    w = jnp.asarray(rng.normal(size=w_shape).astype(np.float32))

    ref = jax.jit(jax.grad(lambda v: jnp.sum(w * _ref_pool(v, **STEM))))(x)
    got = jax.jit(jax.grad(lambda v: jnp.sum(
        w * pool(v, STEM["window"], STEM["strides"],
                 STEM["padding"]))))(x)
    # A position claimed by several overlapping windows accumulates its
    # cotangents in a different order than SelectAndScatter -> last-ulp
    # float noise; attribution itself is exact (tie tests above).
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)


def test_convenience_wrapper_defaults():
    x = jnp.asarray(np.random.default_rng(6).normal(size=(1, 8, 8, 8, 2))
                    .astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(max_pool3d(x)),  # 2^3 stride 2, VALID
        np.asarray(nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2),
                               padding="VALID")))
    np.testing.assert_array_equal(
        np.asarray(max_pool3d(x, 3, 2, 1)),
        np.asarray(nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                               padding=[(1, 1)] * 3)))
