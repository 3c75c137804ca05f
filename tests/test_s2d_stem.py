"""Space-to-depth stem == direct 7^3/s2/p3 conv, bit-for-bit semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.resnet3d import (
    MedicalNetResNet3D,
    SpaceToDepthStem,
    _conv,
)


@pytest.mark.parametrize("shape", [(91, 109, 91), (16, 20, 16),
                                   (17, 19, 21)])
def test_s2d_equals_direct_conv(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2,) + shape + (1,)).astype(np.float32))

    stem = SpaceToDepthStem(8)
    variables = stem.init(jax.random.PRNGKey(0), x)
    out_s2d = stem.apply(variables, x)

    class Direct:
        pass

    import flax.linen as nn

    class DirectStem(nn.Module):
        @nn.compact
        def __call__(self, x):
            return _conv(8, 7, stride=2, name="conv1")(x)

    direct = DirectStem()
    out_direct = direct.apply(
        {"params": {"conv1": {"kernel": variables["params"]["kernel"]}}}, x)

    assert out_s2d.shape == out_direct.shape
    np.testing.assert_allclose(np.asarray(out_s2d), np.asarray(out_direct),
                               rtol=1e-4, atol=1e-5)


def test_backbone_s2d_matches_plain_stem():
    """Full backbone: s2d stem and plain stem give the same features with
    shared params (the param tree is identical by construction)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 20, 24, 20, 1)).astype(np.float32))
    m_fast = MedicalNetResNet3D(depth=10, stem_s2d=True)
    m_ref = MedicalNetResNet3D(depth=10, stem_s2d=False)
    variables = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    out_ref = m_ref.apply(variables, x, train=False)
    out_fast = m_fast.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-5)
