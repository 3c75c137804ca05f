"""Space-to-batch dilated conv == naive dilated conv, exactly."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.resnet3d import (
    MedicalNetResNet3D,
    SpaceToBatchConv3D,
    _conv,
)


@pytest.mark.parametrize("d", [2, 4])
@pytest.mark.parametrize("shape", [(12, 14, 12), (8, 8, 8), (7, 9, 11)])
def test_s2b_equals_dilated_conv(d, shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2,) + shape + (6,)).astype(np.float32))

    s2b = SpaceToBatchConv3D(5, dilation=d)
    variables = s2b.init(jax.random.PRNGKey(0), x)
    out_s2b = s2b.apply(variables, x)

    class Naive(nn.Module):
        @nn.compact
        def __call__(self, x):
            return _conv(5, 3, stride=1, dilation=d, name="c")(x)

    out_naive = Naive().apply(
        {"params": {"c": {"kernel": variables["params"]["kernel"]}}}, x)

    assert out_s2b.shape == out_naive.shape
    np.testing.assert_allclose(np.asarray(out_s2b), np.asarray(out_naive),
                               rtol=1e-4, atol=1e-5)


def test_backbone_s2b_matches_naive():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 20, 24, 20, 1)).astype(np.float32))

    class Ref(MedicalNetResNet3D):
        pass

    m_fast = MedicalNetResNet3D(depth=10)
    # naive path: monkey-flag via block construction (s2b applies only to
    # dilated layers); compare with a backbone whose blocks use the naive
    # conv by setting dilation handling off through the module tree.
    import multimodal_alzheimer_tpu.models.resnet3d as r3d

    variables = m_fast.init(jax.random.PRNGKey(0), x, train=False)
    out_fast = m_fast.apply(variables, x, train=False)

    orig = r3d._conv3x3

    def naive(features, stride, dilation, s2b, name, *args, **kwargs):
        return orig(features, stride, dilation, False, name,
                    *args, **kwargs)

    r3d._conv3x3 = naive
    try:
        out_naive = m_fast.apply(variables, x, train=False)
    finally:
        r3d._conv3x3 = orig
    np.testing.assert_allclose(np.asarray(out_fast), np.asarray(out_naive),
                               rtol=1e-4, atol=1e-5)
