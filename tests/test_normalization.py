"""Normalization parity vs the reference's torch math (dataloader.py:206-281)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from multimodal_alzheimer_tpu.ops import (
    compute_split_stats,
    masked_nonzero_quantile,
    mri_per_scan_minmax,
    mri_per_scan_zscore,
    normalize_mri,
    normalize_pet,
)
from multimodal_alzheimer_tpu.ops.quantile import masked_nonzero_mean_std
from multimodal_alzheimer_tpu.ops import pallas_norm


SHAPE = (19, 23, 17)  # small volume; same code path as 91x109x91


def _volume_and_mask(seed=0, shape=SHAPE):
    rng = np.random.default_rng(seed)
    vol = (rng.normal(size=shape) * 400 + 900).astype(np.float32)
    mask = (rng.random(shape) > 0.4).astype(np.float32)
    return vol, mask


def _torch_masked_values(vol, mask):
    """Reference recipe: mask, flatten, drop zeros (dataloader.py:244-249)."""
    data = torch.tensor(vol) * torch.tensor(mask)
    data = data.reshape(-1)
    return data[data.nonzero()]


@pytest.mark.parametrize("q", [0.95, 0.98, 0.99, 1.0])
def test_masked_quantile_matches_torch(q):
    vol, mask = _volume_and_mask()
    vals = _torch_masked_values(vol, mask)
    expected_max = torch.quantile(vals, q, interpolation="linear").item()
    expected_min = torch.quantile(vals, 1 - q, interpolation="linear").item()

    ours = masked_nonzero_quantile(jnp.asarray(vol), jnp.asarray(mask),
                                   (q, 1.0 - q))
    np.testing.assert_allclose(np.asarray(ours[0]), expected_max, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours[1]), expected_min, rtol=1e-5)


def test_masked_quantile_without_mask():
    vol, _ = _volume_and_mask(seed=1)
    vals = torch.tensor(vol).reshape(-1)
    vals = vals[vals.nonzero()]
    expected = torch.quantile(vals, 0.5, interpolation="linear").item()
    ours = masked_nonzero_quantile(jnp.asarray(vol), None, (0.5,))
    np.testing.assert_allclose(np.asarray(ours[0]), expected, rtol=1e-5)


def test_masked_mean_std_matches_torch_std_mean():
    vol, mask = _volume_and_mask(seed=2)
    vals = _torch_masked_values(vol, mask)
    std_t, mean_t = torch.std_mean(vals)
    mean_o, std_o = masked_nonzero_mean_std(jnp.asarray(vol), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(mean_o), mean_t.item(), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(std_o), std_t.item(), rtol=1e-4)


def test_per_scan_zscore_matches_reference_recipe():
    vol, mask = _volume_and_mask(seed=3)
    vals = _torch_masked_values(vol, mask)
    std_t, mean_t = torch.std_mean(vals)
    expected = ((torch.tensor(vol) - mean_t) / std_t) * torch.tensor(mask)

    ours = mri_per_scan_zscore(jnp.asarray(vol), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("q", [0.95, 0.99])
def test_per_scan_minmax_matches_reference_recipe(q):
    vol, mask = _volume_and_mask(seed=4)
    vals = _torch_masked_values(vol, mask)
    qmax = torch.quantile(vals, q, interpolation="linear")
    qmin = torch.quantile(vals, 1 - q, interpolation="linear")
    expected = (torch.tensor(vol) - qmin) / (qmax - qmin)
    expected[expected > 1] = 1
    expected[expected < 0] = 0
    expected = expected * torch.tensor(mask)

    ours = mri_per_scan_minmax(jnp.asarray(vol), jnp.asarray(mask), q)
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_normalize_pet():
    vol, _ = _volume_and_mask(seed=5)
    out = normalize_pet(jnp.asarray(vol), 0.5145, 0.5383)
    np.testing.assert_allclose(np.asarray(out), (vol - 0.5145) / 0.5383,
                               rtol=1e-5)


def test_normalize_mri_dispatch():
    vol, mask = _volume_and_mask(seed=6)
    v, m = jnp.asarray(vol), jnp.asarray(mask)
    np.testing.assert_allclose(
        np.asarray(normalize_mri(v, m, {"per_scan_norm": "normalize"})),
        np.asarray(mri_per_scan_zscore(v, m)))
    np.testing.assert_allclose(
        np.asarray(normalize_mri(v, m, {"per_scan_norm": "min_max"}, 0.98)),
        np.asarray(mri_per_scan_minmax(v, m, 0.98)))
    stats = {"all_scan_norm": {"mean": 426.9336, "std": 1018.7830}}
    np.testing.assert_allclose(
        np.asarray(normalize_mri(v, m, stats)),
        (vol - 426.9336) / 1018.7830, rtol=1e-4)
    assert normalize_mri(v, m, None) is v
    with pytest.raises(ValueError):
        normalize_mri(v, m, {"per_scan_norm": "bogus"})
    with pytest.raises(ValueError):
        normalize_mri(v, m, {"bogus": 1})


def test_pallas_zscore_matches_xla(monkeypatch):
    vols = np.stack([_volume_and_mask(seed=s)[0] for s in (7, 8)])
    masks = np.stack([_volume_and_mask(seed=s)[1] for s in (7, 8)])
    expected = jax.vmap(mri_per_scan_zscore)(jnp.asarray(vols),
                                             jnp.asarray(masks))
    ours = pallas_norm.per_scan_zscore(jnp.asarray(vols), jnp.asarray(masks),
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               rtol=2e-3, atol=2e-4)


def test_pallas_minmax_apply_matches_xla():
    vols = np.stack([_volume_and_mask(seed=s)[0] for s in (9, 10)])
    masks = np.stack([_volume_and_mask(seed=s)[1] for s in (9, 10)])
    q = 0.98
    expected = jax.vmap(lambda v, m: mri_per_scan_minmax(v, m, q))(
        jnp.asarray(vols), jnp.asarray(masks))
    quants = jax.vmap(
        lambda v, m: masked_nonzero_quantile(v, m, (1.0 - q, q)))(
            jnp.asarray(vols), jnp.asarray(masks))
    ours = pallas_norm.minmax_apply(jnp.asarray(vols), jnp.asarray(masks),
                                    quants[:, 0], quants[:, 1],
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected),
                               rtol=1e-4, atol=1e-5)


def test_compute_split_stats_matches_reference_estimator():
    """standardization.py:34-55 mean-of-means estimator parity."""
    rng = np.random.default_rng(11)
    vols = [rng.normal(size=SHAPE).astype(np.float32) * (i + 1)
            for i in range(5)]
    mean_x = sum(torch.tensor(v).mean() for v in vols) / len(vols)
    mean_x2 = sum((torch.tensor(v) ** 2).mean() for v in vols) / len(vols)
    std = torch.sqrt(mean_x2 - mean_x ** 2)

    mean_o, std_o = compute_split_stats(vols)
    np.testing.assert_allclose(mean_o, mean_x.item(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(std_o, std.item(), rtol=1e-4)
