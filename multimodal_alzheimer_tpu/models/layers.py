"""Shared 3D building blocks (flax, NDHWC channels-last — the TPU layout).

Semantics match the reference's torch blocks:
  * ``conv_block`` = Conv3d(pad 'same') -> [BatchNorm3d] -> ReLU ->
    MaxPool3d(2) -> [Dropout] (reference: pet_cnn.py:17-28),
  * ``max_pool3d(2)`` uses VALID padding, i.e. torch's floor semantics,
  * ``global_avg_pool`` = AdaptiveAvgPool3d(1) + Flatten.

BatchNorm: momentum 0.9 (flax convention) == torch momentum 0.1; eps 1e-5.
Note torch normalizes with biased batch variance and tracks *unbiased*
running variance; flax tracks the biased one — a divergence that only
affects eval-mode statistics of freshly trained models, not convergence
(PARITY.md divergence 3). ``TorchStatsBatchNorm`` (opt-in via the
``bn_torch_stats`` hparam / module attribute) closes it: identical
normalization, Bessel-corrected running-variance EMA like torch
(tests/test_bn_torch_stats.py proves running-stat equality against
``torch.nn.BatchNorm3d`` step-for-step).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import flax.linen as nn
import jax.numpy as jnp


class TorchStatsBatchNorm(nn.Module):
    """BatchNorm with torch's running-statistics semantics.

    Normalization is the standard biased-batch-variance affine (same as
    flax ``nn.BatchNorm`` and ``torch.nn.BatchNorm3d`` in train mode);
    the one difference from flax is the running-variance EMA, which uses
    the Bessel-corrected batch variance exactly like torch
    (``running_var = m*running_var + (1-m)*var_biased*n/(n-1)`` in flax's
    momentum convention) — PARITY.md divergence 3. Variable tree matches
    ``nn.BatchNorm`` (``batch_stats/{mean,var}``, ``params/{scale,bias}``)
    so checkpoints and ``tools/convert_reference.py`` interoperate.

    The Bessel ``n`` is the static per-feature element count of the
    GLOBAL logical batch — correct under GSPMD data parallelism, where
    jit shapes are global and the stat means already reduce across
    shards via compiler-inserted collectives.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                bessel = jnp.float32(n / max(n - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var * bessel)
        dtype = self.dtype or x.dtype
        mul = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(dtype)
        return (x.astype(dtype) - mean.astype(dtype)) * mul \
            + bias.astype(dtype)


def batch_norm(train: bool, name: str, dtype=jnp.float32,
               torch_stats: bool = False):
    """The repo-wide BatchNorm factory (momentum 0.9, eps 1e-5).

    ``torch_stats=True`` selects :class:`TorchStatsBatchNorm` — torch's
    unbiased running-variance EMA — for eval-stat parity with models the
    reference trains from scratch. Identical parameter/stat trees either
    way.
    """
    cls = TorchStatsBatchNorm if torch_stats else nn.BatchNorm
    return cls(use_running_average=not train, momentum=0.9, epsilon=1e-5,
               dtype=dtype, name=name)


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
    bn_torch_stats: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size,) * 3, padding="SAME",
                    dtype=self.dtype, name="conv")(x)
        if self.use_batchnorm:
            x = batch_norm(train, "bn", self.dtype,
                           self.bn_torch_stats)(x)
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
    bn_torch_stats: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, (features, kernel) in enumerate(
                zip(self.conv_out, self.filter_size)):
            x = ConvBlock3D(features, kernel, self.use_batchnorm,
                            self.dropout_p, self.dtype,
                            self.bn_torch_stats,
                            name=f"block_{i}")(x, train)
        return x
