"""TorchStatsBatchNorm: torch running-statistics parity (PARITY div. 3).

flax ``nn.BatchNorm`` tracks the *biased* batch variance in its running
EMA while torch tracks the Bessel-corrected one — an eval-mode-only
divergence for freshly trained models. ``TorchStatsBatchNorm`` (opt-in
via the ``bn_torch_stats`` hparam) matches torch step-for-step; these
tests pin that against ``torch.nn.BatchNorm3d`` and check the variable
tree stays interchangeable with ``nn.BatchNorm`` checkpoints.
"""

import numpy as np
import torch

import flax.linen as nn
import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models.layers import TorchStatsBatchNorm

B, D, H, W, C = 4, 5, 6, 4, 3


def _torch_bn():
    bn = torch.nn.BatchNorm3d(C, eps=1e-5, momentum=0.1, affine=True)
    bn.train()
    return bn


def test_running_stats_match_torch_step_for_step():
    rng = np.random.default_rng(0)
    model = TorchStatsBatchNorm(use_running_average=False)
    x0 = rng.normal(1.5, 2.0, (B, D, H, W, C)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x0))
    tbn = _torch_bn()

    apply = jax.jit(lambda v, x: model.apply(
        v, x, mutable=["batch_stats"]))
    for step in range(5):
        x = rng.normal(step, 1.0 + step, (B, D, H, W, C)).astype(np.float32)
        y, updates = apply(variables, jnp.asarray(x))
        variables = {**variables, **updates}
        yt = tbn(torch.tensor(x).permute(0, 4, 1, 2, 3))
        np.testing.assert_allclose(
            np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 4, 1),
            rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(variables["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # eval mode uses the (now torch-identical) running stats
    eval_model = TorchStatsBatchNorm(use_running_average=True)
    x = rng.normal(0, 1, (B, D, H, W, C)).astype(np.float32)
    y = eval_model.apply(variables, jnp.asarray(x))
    tbn.eval()
    yt = tbn(torch.tensor(x).permute(0, 4, 1, 2, 3))
    np.testing.assert_allclose(
        np.asarray(y), yt.detach().numpy().transpose(0, 2, 3, 4, 1),
        rtol=2e-5, atol=2e-5)


def test_variable_tree_interchangeable_with_flax_bn():
    x = jnp.zeros((2, 3, 3, 3, C))
    v_torch = TorchStatsBatchNorm(use_running_average=False).init(
        jax.random.PRNGKey(0), x)
    v_flax = nn.BatchNorm(use_running_average=False).init(
        jax.random.PRNGKey(0), x)
    to_shapes = lambda t: jax.tree_util.tree_map(lambda a: a.shape, t)
    assert to_shapes(v_torch) == to_shapes(v_flax)

    # flax-trained stats load straight into the torch-stats module
    y = TorchStatsBatchNorm(use_running_average=True).apply(v_flax, x)
    assert y.shape == x.shape


def test_hparams_flag_reaches_every_bn():
    from multimodal_alzheimer_tpu.models import AnatCNN, SmallPETCNN

    hp = {"n_classes": 3, "conv_out": (4,), "filter_size": (3,),
          "batchnorm": True, "linear_out": 8, "bn_torch_stats": True}
    assert SmallPETCNN.from_hparams(hp).bn_torch_stats is True

    mri_hp = {"n_classes": 3, "resnet_depth": 10, "linear_out": (),
              "batchnorm_begin": True, "bn_torch_stats": True}
    model = AnatCNN.from_hparams(mri_hp)
    assert model.bn_torch_stats is True

    # the two estimators produce identical train-mode outputs but
    # different running variances (Bessel factor folds into the EMA)
    rng = np.random.default_rng(1)
    batch = {"mri": jnp.asarray(
        rng.normal(900, 400, (2, 12, 14, 12)).astype(np.float32))}
    base = AnatCNN.from_hparams({**mri_hp, "bn_torch_stats": False})
    v0 = base.init(jax.random.PRNGKey(0), batch, train=False)
    out_a, upd_a = model.apply(v0, batch, train=True,
                               mutable=["batch_stats"])
    out_b, upd_b = base.apply(v0, batch, train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_a["logits"]),
                               np.asarray(out_b["logits"]),
                               rtol=1e-4, atol=1e-4)
    var_a = upd_a["batch_stats"]["backbone"]["bn1"]["var"]
    var_b = upd_b["batch_stats"]["backbone"]["bn1"]["var"]
    assert not np.allclose(np.asarray(var_a), np.asarray(var_b))
    # and they differ exactly by the Bessel factor on the batch-var term
    v_init = np.ones_like(np.asarray(var_b))
    n = 2 * 6 * 7 * 6  # bn1 elements per channel: batch x stem output
    batch_var_b = (np.asarray(var_b) - 0.9 * v_init) / 0.1
    batch_var_a = (np.asarray(var_a) - 0.9 * v_init) / 0.1
    np.testing.assert_allclose(batch_var_a, batch_var_b * n / (n - 1),
                               rtol=1e-3)
