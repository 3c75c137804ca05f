"""Shared 3D building blocks (flax, NDHWC channels-last — the TPU layout).

Semantics match the reference's torch blocks:
  * ``conv_block`` = Conv3d(pad 'same') -> [BatchNorm3d] -> ReLU ->
    MaxPool3d(2) -> [Dropout] (reference: pet_cnn.py:17-28),
  * ``max_pool3d(2)`` uses VALID padding, i.e. torch's floor semantics,
  * ``global_avg_pool`` = AdaptiveAvgPool3d(1) + Flatten.

BatchNorm: momentum 0.9 (flax convention) == torch momentum 0.1; eps 1e-5.
Note torch normalizes with biased batch variance and tracks *unbiased*
running variance; flax tracks the biased one — a documented divergence that
only affects eval-mode statistics of freshly trained models, not convergence.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp


def max_pool3d(x: jnp.ndarray, window: int = 2,
               stride: Optional[int] = None) -> jnp.ndarray:
    # XLA's SelectAndScatter backward measured faster end-to-end than the
    # scatter-free custom VJP in ops/maxpool.py (see resnet3d._max_pool_stem
    # note); the custom VJP remains available + parity-tested.
    stride = stride or window
    return nn.max_pool(x, (window,) * 3, strides=(stride,) * 3,
                       padding="VALID")


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool3d(1) + Flatten: (B, D, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2, 3))


class ConvBlock3D(nn.Module):
    """Conv3d('same') -> [BN] -> ReLU -> MaxPool(2) -> [Dropout]."""

    features: int
    kernel_size: int
    use_batchnorm: bool = False
    dropout_p: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size,) * 3, padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        if self.use_batchnorm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        x = max_pool3d(x)
        if self.dropout_p is not None:
            x = nn.Dropout(rate=self.dropout_p, name="dropout")(
                x, deterministic=not train)
        return x


class ConvTower3D(nn.Module):
    """n x ConvBlock3D with per-layer widths/kernels (pet_cnn.py:17-28)."""

    conv_out: Sequence[int]
    filter_size: Sequence[int]
    use_batchnorm: bool = False
    dropout_p: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (features, kernel) in enumerate(
                zip(self.conv_out, self.filter_size)):
            x = ConvBlock3D(features, kernel, self.use_batchnorm,
                            self.dropout_p, self.dtype,
                            name=f"block_{i}")(x, train)
        return x
