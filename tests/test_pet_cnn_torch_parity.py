"""Small_PET_CNN logit parity: torch replica vs our flax model.

Builds the reference architecture in torch (pet_cnn.py:14-45), maps its
weights onto SmallPETCNN, and checks logits agree in eval mode — covering
'same'-padding convs, BatchNorm eval stats, floor max-pool, GAP and the
dense head end to end.
"""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.models import SmallPETCNN


def _torch_small_pet_cnn(conv_out, filter_size, batchnorm, linear_out,
                         n_classes, n_in=1):
    mods = []
    for c, k in zip(conv_out, filter_size):
        mods.append(nn.Conv3d(n_in, c, k, padding="same"))
        if batchnorm:
            mods.append(nn.BatchNorm3d(c))
        mods.append(nn.ReLU())
        mods.append(nn.MaxPool3d(2))
        n_in = c
    mods += [nn.AdaptiveAvgPool3d(1), nn.Flatten()]
    if linear_out:
        mods += [nn.Linear(n_in, linear_out), nn.ReLU()]
        n_in = linear_out
    mods.append(nn.Linear(n_in, n_classes))
    return nn.Sequential(*mods)


def _convert(model_t, conv_out, batchnorm, linear_out):
    params = {"convs": {}}
    stats = {"convs": {}}
    idx = 0
    mods = list(model_t)
    for i in range(len(conv_out)):
        block_p = {}
        block_s = {}
        conv = mods[idx]; idx += 1
        block_p["conv"] = {
            "kernel": np.transpose(conv.weight.detach().numpy(),
                                   (2, 3, 4, 1, 0)),
            "bias": conv.bias.detach().numpy()}
        if batchnorm:
            bn = mods[idx]; idx += 1
            block_p["bn"] = {"scale": bn.weight.detach().numpy(),
                             "bias": bn.bias.detach().numpy()}
            block_s["bn"] = {"mean": bn.running_mean.numpy(),
                             "var": bn.running_var.numpy()}
        idx += 2  # ReLU, MaxPool
        params["convs"][f"block_{i}"] = block_p
        if block_s:
            stats["convs"][f"block_{i}"] = block_s
    idx += 2  # GAP, Flatten
    if linear_out:
        lin = mods[idx]; idx += 2  # Linear, ReLU
        params["hidden"] = {"kernel": lin.weight.detach().numpy().T,
                            "bias": lin.bias.detach().numpy()}
    cls = mods[idx]
    params["cls"] = {"kernel": cls.weight.detach().numpy().T,
                     "bias": cls.bias.detach().numpy()}
    variables = {"params": params}
    if batchnorm:
        variables["batch_stats"] = stats
    return variables


def test_logit_parity_with_torch_reference():
    conv_out, filter_size = (4, 8), (5, 3)
    torch.manual_seed(0)
    ref = _torch_small_pet_cnn(conv_out, filter_size, True, 16, 3).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 20, 24, 20)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x).unsqueeze(1)).numpy()

    model = SmallPETCNN.from_hparams({
        "n_classes": 3, "conv_out": conv_out, "filter_size": filter_size,
        "batchnorm": True, "linear_out": 16})
    variables = _convert(ref, conv_out, True, 16)
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        {"pet1451": jnp.asarray(x)}, train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]), expected,
                               rtol=2e-4, atol=2e-5)


def test_logit_parity_no_batchnorm_no_hidden():
    conv_out, filter_size = (4, 8), (3, 3)
    torch.manual_seed(1)
    ref = _torch_small_pet_cnn(conv_out, filter_size, False, 0, 2).eval()
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 17, 19, 16)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x).unsqueeze(1)).numpy()
    model = SmallPETCNN.from_hparams({
        "n_classes": 2, "conv_out": conv_out, "filter_size": filter_size,
        "batchnorm": False, "linear_out": False})
    variables = _convert(ref, conv_out, False, 0)
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        {"pet1451": jnp.asarray(x)}, train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]), expected,
                               rtol=2e-4, atol=2e-5)
