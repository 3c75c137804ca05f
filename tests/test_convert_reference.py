"""Full-model conversion parity: torch Anat_CNN replica -> AnatCNN logits.

Extends the backbone-only test (test_weight_conversion.py) to the complete
reference model including the conv_seg head with batchnorm_begin, dense
layers and the trailing-ReLU quirk (anat_cnn.py:33-79).
"""

import sys

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")

from convert_reference import convert_anat_cnn, convert_small_pet_cnn
from multimodal_alzheimer_tpu.models import AnatCNN, SmallPETCNN
from tests.test_weight_conversion import TorchMed3D


def _torch_anat_cnn(hparams):
    """Reference Anat_CNN replica: Med3D backbone + conv_seg head."""
    backbone = TorchMed3D((1, 1, 1, 1))
    mods = []
    n_in = 512
    if hparams.get("batchnorm_begin"):
        mods.append(nn.BatchNorm3d(n_in))
    mods += [nn.AdaptiveAvgPool3d(1), nn.Flatten()]
    for n_out in hparams.get("linear_out") or ():
        mods.append(nn.Linear(n_in, n_out))
        if hparams.get("batchnorm_dense"):
            mods.append(nn.BatchNorm1d(n_out))
        mods.append(nn.ReLU())
        n_in = n_out
    mods.append(nn.Linear(n_in, hparams["n_classes"]))
    mods.append(nn.ReLU())  # trailing-ReLU quirk (anat_cnn.py:77)
    backbone.conv_seg = nn.Sequential(*mods)

    class Full(nn.Module):
        def __init__(self):
            super().__init__()
            self.model = backbone

        def forward(self, x):
            h = self.model(x)
            return self.model.conv_seg(h)

    return Full()


def test_full_anat_cnn_conversion_logit_parity():
    hparams = {"n_classes": 3, "resnet_depth": 10,
               "batchnorm_begin": True, "linear_out": (32,),
               "batchnorm_dense": False}
    torch.manual_seed(0)
    ref = _torch_anat_cnn(hparams).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (nn.BatchNorm3d, nn.BatchNorm1d)):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 24, 28, 24)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x)).numpy()

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_anat_cnn(sd, hparams)

    model = AnatCNN.from_hparams(hparams)
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        {"mri": jnp.asarray(x[:, 0])}, train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]), expected,
                               rtol=2e-3, atol=2e-4)
    # trailing-ReLU quirk preserved: logits >= 0
    assert np.asarray(out["logits"]).min() >= 0


def test_small_pet_cnn_conversion_against_existing_oracle():
    """convert_small_pet_cnn agrees with the in-test converter used by
    test_pet_cnn_torch_parity (same torch replica)."""
    from tests.test_pet_cnn_torch_parity import _torch_small_pet_cnn

    hparams = {"n_classes": 3, "conv_out": (4, 8), "filter_size": (5, 3),
               "batchnorm": True, "linear_out": 16}
    torch.manual_seed(2)
    ref = _torch_small_pet_cnn((4, 8), (5, 3), True, 16, 3).eval()
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    sd = {f"model.{k}": v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_small_pet_cnn(sd, hparams)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 20, 24, 20)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x).unsqueeze(1)).numpy()
    model = SmallPETCNN.from_hparams(hparams)
    out = model.apply(jax.tree_util.tree_map(jnp.asarray, variables),
                      {"pet1451": jnp.asarray(x)}, train=False)
    np.testing.assert_allclose(np.asarray(out["logits"]), expected,
                               rtol=2e-4, atol=2e-5)
