"""S2DConvReLUPool: exactness vs the naive conv->relu->maxpool path.

The parity decomposition (layers.py:S2DConvReLUPool) must reproduce the
direct Conv3d('same', stride 1) -> ReLU -> MaxPool(2) block — same
parameter tree, same outputs, same gradients — for every odd kernel and
channel count the PET tower uses, including odd spatial extents (the
zero-padded tail must never leak into outputs or gradients).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.layers import ConvBlock3D

CASES = [
    # (spatial, cin, features, kernel)
    ((13, 14, 9), 1, 8, 5),    # PET block0 shape class (odd extents)
    ((11, 13, 11), 8, 16, 5),  # PET block1 class
    ((10, 13, 10), 16, 32, 3), # PET block2 class (even/odd mix)
    ((6, 7, 6), 32, 64, 3),
]


def _blocks(cin, features, kernel):
    fused = ConvBlock3D(features, kernel, dtype=jnp.float32, s2d_pool=True)
    naive = ConvBlock3D(features, kernel, dtype=jnp.float32, s2d_pool=False)
    return fused, naive


@pytest.mark.parametrize("spatial,cin,features,kernel", CASES)
def test_fused_matches_naive(spatial, cin, features, kernel):
    rng = np.random.default_rng(hash((spatial, cin)) % 2 ** 31)
    x = jnp.asarray(rng.normal(size=(2,) + spatial + (cin,))
                    .astype(np.float32))
    fused, naive = _blocks(cin, features, kernel)
    v = naive.init(jax.random.PRNGKey(0), x)
    # identical parameter trees (same path/shape -> same init draws)
    v_f = fused.init(jax.random.PRNGKey(0), x)
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_f = fused.apply(v, x)
    out_n = naive.apply(v, x)
    assert out_f.shape == out_n.shape
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("spatial,cin,features,kernel", CASES[:2])
def test_fused_gradients_match(spatial, cin, features, kernel):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2,) + spatial + (cin,))
                    .astype(np.float32))
    fused, naive = _blocks(cin, features, kernel)
    v = naive.init(jax.random.PRNGKey(0), x)
    cot = jnp.asarray(rng.normal(
        size=naive.apply(v, x).shape).astype(np.float32))

    def loss(mod):
        return lambda params, xx: jnp.vdot(mod.apply(params, xx), cot)

    g_f = jax.grad(loss(fused), argnums=(0, 1))(v, x)
    g_n = jax.grad(loss(naive), argnums=(0, 1))(v, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("torch_stats", [False, True])
@pytest.mark.parametrize("spatial,cin,features,kernel", CASES[:3])
def test_bn_fused_matches_naive(spatial, cin, features, kernel,
                                torch_stats):
    """BatchNorm blocks fuse too: ParityBatchNorm's masked moments over
    the parity_out layout equal the naive path's full pre-pool stats —
    outputs, updated running stats (both EMA conventions), and eval mode
    all match, on the same variable tree."""
    if cin > 8:
        pytest.skip("fused path only engages at cin <= 8")
    rng = np.random.default_rng(hash((spatial, cin, torch_stats)) % 2**31)
    x = jnp.asarray(rng.normal(size=(2,) + spatial + (cin,))
                    .astype(np.float32))
    fused = ConvBlock3D(features, kernel, use_batchnorm=True,
                        dtype=jnp.float32, s2d_pool=True,
                        bn_torch_stats=torch_stats)
    naive = ConvBlock3D(features, kernel, use_batchnorm=True,
                        dtype=jnp.float32, s2d_pool=False,
                        bn_torch_stats=torch_stats)
    v = naive.init(jax.random.PRNGKey(0), x, train=False)
    v_f = fused.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_f))
    for a, b in zip(jax.tree_util.tree_leaves(v),
                    jax.tree_util.tree_leaves(v_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_n, mut_n = naive.apply(v, x, train=True, mutable=["batch_stats"])
    out_f, mut_f = fused.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               rtol=2e-5, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mut_n),
                    jax.tree_util.tree_leaves(mut_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(fused.apply(v, x, train=False)),
                               np.asarray(naive.apply(v, x, train=False)),
                               rtol=2e-5, atol=2e-5)


def test_bn_fused_gradients_match():
    spatial, cin, features, kernel = CASES[0][:4]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2,) + spatial + (cin,))
                    .astype(np.float32))
    fused = ConvBlock3D(features, kernel, use_batchnorm=True,
                        dtype=jnp.float32, s2d_pool=True)
    naive = ConvBlock3D(features, kernel, use_batchnorm=True,
                        dtype=jnp.float32, s2d_pool=False)
    v = naive.init(jax.random.PRNGKey(0), x, train=True)
    out0, _ = naive.apply(v, x, train=True, mutable=["batch_stats"])
    cot = jnp.asarray(rng.normal(size=out0.shape).astype(np.float32))

    def loss(mod):
        def f(params, xx):
            out, _ = mod.apply(params, xx, train=True,
                               mutable=["batch_stats"])
            return jnp.vdot(out, cot)
        return f

    g_f = jax.grad(loss(fused), argnums=(0, 1))(v, x)
    g_n = jax.grad(loss(naive), argnums=(0, 1))(v, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_f),
                    jax.tree_util.tree_leaves(g_n)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)


def test_pet_cnn_paths_share_checkpoints_and_match():
    """SmallPETCNN outputs are path-independent; one variable tree serves
    both the fused and naive paths (checkpoint interop both ways)."""
    from multimodal_alzheimer_tpu.models import SmallPETCNN

    hp = {"n_classes": 3, "conv_out": (4, 8), "filter_size": (5, 3),
          "linear_out": 8}
    rng = np.random.default_rng(2)
    batch = {"pet1451": jnp.asarray(
        rng.normal(0.5, 0.5, (2, 13, 15, 13)).astype(np.float32))}
    fast = SmallPETCNN.from_hparams(hp)
    assert fast.s2d_pool
    slow = SmallPETCNN.from_hparams(hp, s2d_pool=False)
    v = fast.init(jax.random.PRNGKey(0), batch, train=False)
    out_fast = fast.apply(v, batch, train=False)
    out_slow = slow.apply(v, batch, train=False)
    np.testing.assert_allclose(np.asarray(out_fast["logits"]),
                               np.asarray(out_slow["logits"]),
                               rtol=1e-5, atol=1e-6)
    # BN models share one tree across paths too (ParityBatchNorm's
    # variable tree matches nn.BatchNorm)
    for s2d in (True, False):
        bn_model = SmallPETCNN.from_hparams({**hp, "batchnorm": True},
                                            s2d_pool=s2d)
        vb = bn_model.init(jax.random.PRNGKey(0), batch, train=False)
        assert "bn" in vb["params"]["convs"]["block_0"]
        assert "bn" in vb["batch_stats"]["convs"]["block_0"]
    bn_fast = SmallPETCNN.from_hparams({**hp, "batchnorm": True})
    bn_slow = SmallPETCNN.from_hparams({**hp, "batchnorm": True},
                                       s2d_pool=False)
    np.testing.assert_allclose(
        np.asarray(bn_fast.apply(vb, batch, train=False)["logits"]),
        np.asarray(bn_slow.apply(vb, batch, train=False)["logits"]),
        rtol=1e-5, atol=1e-6)
