"""MedicalNet/Med3D-style 3D ResNet backbones (depths 10/18/34/50), in flax.

The reference imports these from the external MedicalNet package and loads
``resnet_{10,18,50}_23dataset.pth`` (reference: mri_models/anat_cnn.py:18-31,
pet_models/pet_resnet_cnn.py:22-35). This is a from-scratch reimplementation
of that architecture — the Med3D *segmentation-style* backbone:

  stem: Conv3d(k=7, stride=2, pad=3, no bias) -> BN -> ReLU ->
        MaxPool3d(k=3, stride=2, pad=1)
  layer1: 64 planes,  stride 1, dilation 1
  layer2: 128 planes, stride 2, dilation 1
  layer3: 256 planes, stride 1, dilation 2   (no downsampling; dilated)
  layer4: 512 planes, stride 1, dilation 4

BasicBlock (depth 10: [1,1,1,1]; 18: [2,2,2,2]; 34: [3,4,6,3]) or
Bottleneck x4 expansion (depth 50: [3,4,6,3] -> 2048 channels), shortcut
type 'B' (1x1x1 conv + BN projection when shape changes).

Padding is explicit (torch-style symmetric) rather than 'SAME' so that
converted pretrained torch weights produce identical activations; see
tools/convert_medicalnet.py for the .pth -> flax converter.

Layout is NDHWC (channels-last), the native TPU conv layout.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

BLOCK_CONFIGS = {
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
}

FEATURE_WIDTH = {10: 512, 18: 512, 34: 512, 50: 2048}


def _conv(features, kernel, stride=1, dilation=1, name=None,
          dtype=jnp.float32):
    # dtype matters: with flax's default (None) the f32 kernel params
    # promote bf16 activations to f32 and the conv runs at f32 rate on
    # the MXU — silently halving throughput. param_dtype stays f32.
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(features, (kernel,) * 3, strides=(stride,) * 3,
                   kernel_dilation=(dilation,) * 3,
                   padding=[(pad, pad)] * 3, use_bias=False, name=name,
                   dtype=dtype)


class SpaceToBatchConv3D(nn.Module):
    """3^3 dilated conv (stride 1, pad = dilation) via space-to-batch.

    NOTE: measured SLOWER than the naive dilated conv on v5e at the ADNI
    feature-map sizes (259 vs 276 vol/s end-to-end) — XLA already handles
    the dilation well and the layout shuffles dominate. Kept (default off)
    as an exact-equivalence option for other shapes. A dilation-d conv
    only ever combines grid points of equal parity (mod d), so the volume
    splits into d^3 interleaved subgrids, each seeing a *dense* 3^3 conv
    with padding 1 — numerically identical (subgrid edge zeros coincide
    with the dilated conv's zero padding), and the subgrids batch together
    for full MXU utilization. Parameter layout matches ``_conv`` (same
    name/shape), so checkpoints are interchangeable with the naive path.
    """

    features: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 3, x.shape[-1], self.features), jnp.float32
        ).astype(x.dtype)

        b, D, H, W, c = x.shape
        pd, ph, pw = (-D) % d, (-H) % d, (-W) % d
        xp = jnp.pad(x, ((0, 0), (0, pd), (0, ph), (0, pw), (0, 0)))
        dp, hp, wp = D + pd, H + ph, W + pw
        xs = xp.reshape(b, dp // d, d, hp // d, d, wp // d, d, c)
        xs = xs.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
            b * d ** 3, dp // d, hp // d, wp // d, c)

        out = jax.lax.conv_general_dilated(
            xs, w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)

        o = self.features
        out = out.reshape(b, d, d, d, dp // d, hp // d, wp // d, o)
        out = out.transpose(0, 4, 1, 5, 2, 6, 3, 7).reshape(
            b, dp, hp, wp, o)
        return out[:, :D, :H, :W, :]


def _bn(train: bool, name: str, dtype=jnp.float32, fused: bool = False):
    # dtype: keep activations in the model's compute dtype (bf16 on TPU);
    # without it flax promotes to f32 at every BN, inserting casts around
    # each block boundary. Params/running stats stay f32 (param_dtype).
    # fused: lane-packed Pallas BN kernels (ops/pallas_bn.py) — XLA's
    # convert+reduce lowering of BN statistics/gradients costs ~30% of the
    # ResNet-18 train step on v5e. Single-chip only (pallas_call does not
    # partition under GSPMD); identical param/stat trees either way.
    if fused == "full" or fused is True:
        from multimodal_alzheimer_tpu.ops.pallas_bn import FusedBatchNorm

        return FusedBatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=dtype, name=name)
    if fused == "hybrid":
        from multimodal_alzheimer_tpu.ops.pallas_bn import HybridBatchNorm

        return HybridBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=dtype, name=name)
    if fused == "torch_stats":
        # torch-parity running-variance EMA (PARITY.md divergence 3);
        # identical param/stat tree, opt-in via hparams bn_torch_stats.
        from multimodal_alzheimer_tpu.models.layers import (
            TorchStatsBatchNorm,
        )

        return TorchStatsBatchNorm(use_running_average=not train,
                                   momentum=0.9, epsilon=1e-5, dtype=dtype,
                                   name=name)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


def _conv3x3(features, stride, dilation, s2b, name, dtype=jnp.float32):
    """3^3 conv; space-to-batch fast path for stride-1 dilated convs."""
    if s2b and dilation > 1 and stride == 1:
        return SpaceToBatchConv3D(features, dilation, name=name)
    return _conv(features, 3, stride, dilation, name=name, dtype=dtype)


class BasicBlock3D(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    s2b: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_bn: object = False  # False | "hybrid" | "full"

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv3x3(self.planes, self.stride, self.dilation, self.s2b,
                       "conv1", self.dtype)(x)
        out = _bn(train, "bn1", self.dtype, self.fused_bn)(out)
        out = nn.relu(out)
        out = _conv3x3(self.planes, 1, self.dilation, self.s2b,
                       "conv2", self.dtype)(out)
        out = _bn(train, "bn2", self.dtype, self.fused_bn)(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = _conv(self.planes, 1, self.stride,
                             name="downsample_conv", dtype=self.dtype)(x)
            residual = _bn(train, "downsample_bn", self.dtype, self.fused_bn)(residual)
        return nn.relu(out + residual)


class Bottleneck3D(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 4
    s2b: bool = False
    dtype: jnp.dtype = jnp.float32
    fused_bn: object = False  # False | "hybrid" | "full"

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = nn.relu(_bn(train, "bn1", self.dtype, self.fused_bn)(out))
        out = _conv3x3(self.planes, self.stride, self.dilation, self.s2b,
                       "conv2", self.dtype)(out)
        out = nn.relu(_bn(train, "bn2", self.dtype, self.fused_bn)(out))
        out = _conv(self.planes * self.expansion, 1, name="conv3",
                    dtype=self.dtype)(out)
        out = _bn(train, "bn3", self.dtype, self.fused_bn)(out)
        out_ch = self.planes * self.expansion
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = _conv(out_ch, 1, self.stride,
                             name="downsample_conv", dtype=self.dtype)(x)
            residual = _bn(train, "downsample_bn", self.dtype, self.fused_bn)(residual)
        return nn.relu(out + residual)


def _max_pool_stem(x, impl: str = "xla"):
    """MaxPool3d(k=3, s=2, p=1), torch floor semantics via explicit pad.

    ``impl`` selects the backward (all bitwise-identical forward, parity-
    tested tie semantics, tests/test_maxpool_vjp.py):
      "xla": XLA's SelectAndScatter gradient (~18 ms/step at batch 128 on
        v5e) — the default.
      "sf": scatter-free claim-chain VJP (ops/maxpool.py). Measured SLOWER
        end-to-end — 282 vs 322 vol/s: the serialized 27-offset chain +
        parity interleave cost ~46 ms (trace: two 6.5ms copies, 6.3ms pad,
        5ms selects).
      "wf": chain-free winner-offset VJP — independent fusable compares
        instead of the serialized chain. Measured 293 vol/s end-to-end
        (vs 321): better than "sf" but still loses to SelectAndScatter.
    """
    if impl == "sf":
        from multimodal_alzheimer_tpu.ops.maxpool import max_pool3d_sf
        return max_pool3d_sf(x, (3, 3, 3), (2, 2, 2), ((1, 1),) * 3)
    if impl == "wf":
        from multimodal_alzheimer_tpu.ops.maxpool import max_pool3d_wf
        return max_pool3d_wf(x, (3, 3, 3), (2, 2, 2), ((1, 1),) * 3)
    return nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2),
                       padding=[(1, 1)] * 3)


class SpaceToDepthStem(nn.Module):
    """Conv3d(k=7, s=2, p=3) computed via 2x2x2 space-to-depth.

    A 7^3 stride-2 conv on a 1-channel volume starves the MXU (contraction
    depth 1). Rearranging 2x2x2 input blocks into 8 channels and running a
    4^3 stride-1 conv is *numerically identical* (the kernel is the 7^3
    kernel zero-padded to 8^3 and block-transposed) but contracts over
    8 * 64 = 512 elements per tap — the standard MLPerf-ResNet stem
    optimization, extended to 3D. The parameter keeps the canonical
    (7, 7, 7, 1, 64) shape so pretrained-weight conversion is unchanged.
    """

    features: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, 7, 1, self.features), jnp.float32).astype(x.dtype)
        # kernel: pad 7^3 -> 8^3, split each spatial dim into (tap, parity)
        w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
        w8 = w8.reshape(4, 2, 4, 2, 4, 2, 1, self.features)
        w8 = w8.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(
            4, 4, 4, 8, self.features)

        # input: explicit pad 3 (as torch), then pad high side to even
        b = x.shape[0]
        dims = x.shape[1:4]
        pads = [(3, 3 + ((d + 6) % 2)) for d in dims]
        xp = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        d2, h2, w2 = (xp.shape[1] // 2, xp.shape[2] // 2, xp.shape[3] // 2)
        xs = xp.reshape(b, d2, 2, h2, 2, w2, 2)
        xs = xs.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, d2, h2, w2, 8)

        return jax.lax.conv_general_dilated(
            xs, w8, (1, 1, 1), "VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=x.dtype)


class MedicalNetResNet3D(nn.Module):
    """Backbone only: (B, D, H, W, C_in) -> dilated (B, d, h, w, C_out).

    Flags:
      stem_s2d: compute the 7^3/s2 stem via space-to-depth (numerically
        identical, much better MXU utilization; requires C_in == 1).
      dilated: Med3D keeps layers 3-4 at stride 1 with dilation 2/4 (a
        segmentation-style backbone). ``dilated=False`` uses standard
        stride-2 layers instead — same parameter shapes (pretrained
        weights still load) and ~2.2x faster on TPU, but different
        activations; a documented performance mode, not reference parity.
    """

    depth: int = 18
    stem_s2d: bool = True
    dilated: bool = True
    remat: bool = False  # rematerialize blocks: trade FLOPs for HBM
    fused_bn: object = False  # False | "hybrid" | "full" (pallas_bn.py)
    maxpool_impl: str = "xla"  # "xla" | "sf" | "wf" (see _max_pool_stem)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        block_kind, layout = BLOCK_CONFIGS[self.depth]
        block = BasicBlock3D if block_kind == "basic" else Bottleneck3D
        if self.remat:
            block = nn.remat(block, static_argnums=(2,))

        if self.stem_s2d and x.shape[-1] == 1:
            x = SpaceToDepthStem(64, name="conv1")(x)
        else:
            x = _conv(64, 7, stride=2, name="conv1", dtype=self.dtype)(x)
        x = nn.relu(_bn(train, "bn1", self.dtype, self.fused_bn)(x))
        x = _max_pool_stem(x, self.maxpool_impl)

        if self.dilated:  # (planes, stride, dilation) per Med3D resnet.py
            specs = [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
        else:
            specs = [(64, 1, 1), (128, 2, 1), (256, 2, 1), (512, 2, 1)]
        for li, (planes, stride, dilation) in enumerate(specs, start=1):
            for bi in range(layout[li - 1]):
                x = block(planes=planes,
                          stride=stride if bi == 0 else 1,
                          dilation=dilation,
                          dtype=self.dtype,
                          fused_bn=self.fused_bn,
                          name=f"layer{li}_block{bi}")(x, train)
        return x

    @property
    def feature_width(self) -> int:
        return FEATURE_WIDTH[self.depth]
