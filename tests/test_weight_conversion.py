"""Med3D backbone numeric parity: torch reference vs flax via converter.

Builds a torch 3D ResNet with MedicalNet's exact structure (stem 7^3/s2,
maxpool 3/s2/p1, dilated layers 3-4), converts its state_dict with
tools/convert_medicalnet.py, and checks the flax backbone reproduces the
torch activations on the same input — validating conv padding, stride,
dilation, BN eval semantics and the OIDHW->DHWIO kernel transpose.
"""

import sys

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo/tools")

from multimodal_alzheimer_tpu.models.resnet3d import MedicalNetResNet3D
from convert_medicalnet import convert_state_dict


class TorchBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None):
        super().__init__()
        self.conv1 = nn.Conv3d(inplanes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation,
                               bias=False)
        self.bn1 = nn.BatchNorm3d(planes)
        self.conv2 = nn.Conv3d(planes, planes, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm3d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        residual = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            residual = self.downsample(x)
        return self.relu(out + residual)


class TorchMed3D(nn.Module):
    """Structure of MedicalNet resnet10/18 (basic blocks, shortcut B)."""

    def __init__(self, layers=(1, 1, 1, 1)):
        super().__init__()
        self.conv1 = nn.Conv3d(1, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm3d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool3d(kernel_size=3, stride=2, padding=1)
        self.inplanes = 64
        self.layer1 = self._make_layer(64, layers[0], 1, 1)
        self.layer2 = self._make_layer(128, layers[1], 2, 1)
        self.layer3 = self._make_layer(256, layers[2], 1, 2)
        self.layer4 = self._make_layer(512, layers[3], 1, 4)

    def _make_layer(self, planes, blocks, stride, dilation):
        downsample = None
        if stride != 1 or self.inplanes != planes:
            downsample = nn.Sequential(
                nn.Conv3d(self.inplanes, planes, 1, stride=stride,
                          bias=False),
                nn.BatchNorm3d(planes))
        mods = [TorchBasicBlock(self.inplanes, planes, stride, dilation,
                                downsample)]
        self.inplanes = planes
        for _ in range(1, blocks):
            mods.append(TorchBasicBlock(planes, planes, 1, dilation))
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


@pytest.mark.parametrize("depth,layers", [(10, (1, 1, 1, 1))])
def test_backbone_matches_torch(depth, layers):
    torch.manual_seed(0)
    ref = TorchMed3D(layers).eval()
    # randomize BN running stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, nn.BatchNorm3d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 24, 28, 24)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.tensor(x)).numpy()  # (B, C, D, H, W)

    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_state_dict(sd, depth)

    model = MedicalNetResNet3D(depth=depth)
    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # NDHWC
    out = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        x_jax, train=False)
    ours = np.transpose(np.asarray(out), (0, 4, 1, 2, 3))

    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, rtol=2e-3, atol=2e-4)


def test_converted_tree_matches_flax_init():
    """Converted tree structure must equal the flax-initialized tree (so
    graft_params accepts it)."""
    torch.manual_seed(1)
    ref = TorchMed3D((1, 1, 1, 1))
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    variables = convert_state_dict(sd, 10)

    model = MedicalNetResNet3D(depth=10)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 24, 28, 24, 1)), train=False)
    s1 = jax.tree_util.tree_structure(init["params"])
    s2 = jax.tree_util.tree_structure(variables["params"])
    assert s1 == s2, f"{s1}\n!=\n{s2}"
    for (p, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(init["params"])[0],
            jax.tree_util.tree_flatten_with_path(variables["params"])[0]):
        assert np.shape(a) == np.shape(b), jax.tree_util.keystr(p)
