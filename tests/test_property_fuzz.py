"""Property-based fuzzing: quantile parity and pairing invariants."""

import numpy as np
import torch
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from multimodal_alzheimer_tpu.ops.quantile import (
    masked_nonzero_mean_std,
    masked_nonzero_quantile,
)


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 2 ** 16),
    q=st.floats(0.5, 1.0),
    mask_p=st.floats(0.05, 0.95),
    scale=st.floats(0.1, 1000.0),
)
def test_masked_quantile_fuzz_vs_torch(seed, q, mask_p, scale):
    rng = np.random.default_rng(seed)
    vol = (rng.normal(size=(7, 9, 8)) * scale).astype(np.float32)
    mask = (rng.random((7, 9, 8)) > mask_p).astype(np.float32)
    if not np.any(vol * mask):
        return  # empty valid set: reference would also be degenerate

    vals = torch.tensor(vol) * torch.tensor(mask)
    vals = vals.reshape(-1)
    vals = vals[vals.nonzero()]
    expected = torch.quantile(vals, q, interpolation="linear").item()
    ours = float(masked_nonzero_quantile(jnp.asarray(vol),
                                         jnp.asarray(mask), (q,))[0])
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 2 ** 16), shift=st.floats(-1000.0, 1000.0))
def test_masked_mean_std_fuzz_vs_torch(seed, shift):
    rng = np.random.default_rng(seed)
    vol = (rng.normal(size=(6, 8, 6)) * 50 + shift).astype(np.float32)
    mask = (rng.random((6, 8, 6)) > 0.4).astype(np.float32)
    masked = vol * mask
    if np.count_nonzero(masked) < 2:
        return
    vals = torch.tensor(masked).reshape(-1)
    vals = vals[vals.nonzero()]
    std_t, mean_t = torch.std_mean(vals)
    mean_o, std_o = masked_nonzero_mean_std(jnp.asarray(vol),
                                            jnp.asarray(mask))
    np.testing.assert_allclose(float(mean_o), mean_t.item(), rtol=1e-3,
                               atol=1e-3)
    np.testing.assert_allclose(float(std_o), std_t.item(), rtol=1e-3,
                               atol=1e-3)


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(0, 2 ** 16), threshold=st.integers(1, 500))
def test_pairing_fuzz_matches_oracle(seed, threshold):
    from multimodal_alzheimer_tpu.data.pairing import expand_pairings
    from multimodal_alzheimer_tpu.data.synthetic import make_manifest_frame
    from tests.test_pairing import (
        _assert_frames_equal,
        _oracle_expand,
        _split_frames,
    )

    manifest = make_manifest_frame(n_subjects=5, seed=seed, max_sessions=3)
    frames = _split_frames(manifest, ["pet1451", "t1w", "tabular"])
    oracle = _oracle_expand([f.copy() for f in frames], threshold)
    ours = expand_pairings([f.copy() for f in frames], threshold)
    _assert_frames_equal(ours, oracle)


def test_profiler_trace_smoke(tmp_path):
    """utils/profiling.trace writes TensorBoard-profile artifacts."""
    import glob

    import jax

    from multimodal_alzheimer_tpu.utils.profiling import trace

    f = jax.jit(lambda x: (x * x).sum())
    f(jnp.ones((64, 64))).block_until_ready()
    with trace(str(tmp_path)):
        f(jnp.ones((64, 64))).block_until_ready()
    artifacts = glob.glob(str(tmp_path / "plugins" / "profile" / "*" / "*"))
    assert artifacts, "no profile artifacts written"


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2 ** 16),
    n=st.integers(2, 64),
    c=st.integers(2, 5),
    scale=st.floats(0.1, 20.0),
    gamma=st.sampled_from([0.0, 1.0, 2.0, 5.0]),
)
def test_losses_fuzz_vs_torch(seed, n, c, scale, gamma):
    import torch.nn.functional as F

    from multimodal_alzheimer_tpu.losses import (
        focal_loss,
        weighted_cross_entropy,
    )

    rng = np.random.default_rng(seed)
    logits = (rng.normal(size=(n, c)) * scale).astype(np.float32)
    labels = rng.integers(0, c, n).astype(np.int32)
    weights = rng.uniform(0.1, 1.0, c).astype(np.float32)

    ce_ref = torch.nn.CrossEntropyLoss(weight=torch.tensor(weights))(
        torch.tensor(logits), torch.tensor(labels, dtype=torch.long))
    ce_ours = weighted_cross_entropy(jnp.asarray(logits),
                                     jnp.asarray(labels),
                                     jnp.asarray(weights))
    np.testing.assert_allclose(float(ce_ours), ce_ref.item(), rtol=1e-4,
                               atol=1e-6)

    t = torch.tensor(labels, dtype=torch.long).view(-1, 1)
    logpt = F.log_softmax(torch.tensor(logits), dim=1).gather(1, t).view(-1)
    pt = logpt.data.exp()
    fl_ref = (-1 * (1 - pt) ** gamma * logpt).mean()
    fl_ours = focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                         gamma=gamma)
    np.testing.assert_allclose(float(fl_ours), fl_ref.item(), rtol=1e-4,
                               atol=1e-6)
