"""Smoke test for bench.py --pipeline (measure_pipeline).

VERDICT r4 weak #1: measure_pipeline was the one unexercised code path
in the bench suite (hardcoded 91^3 flagship only). The smoke knobs
(volume_shape/depth/batch) shrink it to CPU scale; this pins that the
cache-warm -> loader-feed -> jitted-step loop runs end to end and
reports the same-run device-step rate the bottleneck verdict needs.
"""

import numpy as np

import bench


def test_measure_pipeline_smoke():
    r = bench.measure_pipeline(
        cache_dtype=None, batch_size=4, epochs=2, n_samples=8,
        volume_shape=(12, 14, 12), depth=10)
    assert r["cache_dtype"] == "float32"
    assert r["n_samples"] == 8
    for key in ("feed_only_vol_s", "e2e_train_vol_s",
                "device_step_vol_s"):
        assert np.isfinite(r[key]) and r[key] > 0, (key, r)
    # the warm decode pass ran over every sample
    assert r["warm_pass_s"] >= 0


def test_measure_pipeline_rejects_unusable_knobs():
    """Smoke knobs that would crash mid-run (zero batches from the
    drop_last loader; zero timed epochs) fail fast with clear errors
    (code-review r5)."""
    import pytest

    with pytest.raises(ValueError, match="zero batches"):
        bench.measure_pipeline(batch_size=128, n_samples=8, epochs=2,
                               volume_shape=(12, 14, 12), depth=10)
    with pytest.raises(ValueError, match="epochs"):
        bench.measure_pipeline(batch_size=4, n_samples=8, epochs=1,
                               volume_shape=(12, 14, 12), depth=10)


def test_measure_pipeline_f16_cache_smoke():
    r = bench.measure_pipeline(
        cache_dtype="float16", batch_size=4, epochs=2, n_samples=8,
        volume_shape=(12, 14, 12), depth=10)
    assert r["cache_dtype"] == "float16"
    assert np.isfinite(r["e2e_train_vol_s"]) and r["e2e_train_vol_s"] > 0
