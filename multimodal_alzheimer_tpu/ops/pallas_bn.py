"""Fused training-mode BatchNorm as Pallas TPU kernels (custom VJP).

MEASURED OUTCOME on v5e (ResNet-18 3D @ 91^3, batch 128): 195 vol/s vs
320 vol/s with flax BN — i.e. SLOWER end-to-end, despite the BN
statistics/gradient reductions (convert_reduce_fusion HLOs) costing
~125 ms/step in the profile. Splitting BN out of XLA's op graph forfeits
the elementwise fusion of the BN apply into neighboring conv epilogues,
which outweighs the better-tiled reductions. Kept as a correctness-tested
option (losses match flax bit-for-bit at f32) and as the reference
implementation for a future producer-fused variant; the backbone's
``fused_bn`` flag defaults to False.

Motivation for the kernel design: (a) the bf16->f32 convert+reduce is
poorly tiled by XLA, and (b) narrow channel counts (C=64) leave half the
128 lanes idle.

This kernel packs ``F = 128 // C`` voxels per 128-lane row (a free
bitcast-style view of the (N, C) activation buffer), streams row chunks,
and accumulates per-lane f32 partials in VMEM — full lane utilization and
exactly one HBM pass per reduction:

  forward:  pass 1: per-channel sum / sum-of-squares -> mean, var (biased,
            as torch uses for normalization),
            pass 2: y = (x - mean) * rsqrt(var + eps) * scale + bias.
  backward: pass 1: dbias = sum(g), dscale = sum(g * xhat),
            pass 2: dx = scale*inv * (g - dbias/N - xhat * dscale/N).

API: ``batch_norm_train(x2d, scale, bias, eps)`` on (N, C) activations,
returning (y, mean, var) with gradients for (x, scale, bias). The module
wrapper ``PallasBatchNorm`` is a drop-in for the backbone's BN in training
mode (same param/stat tree as flax ``nn.BatchNorm``).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_CHUNK_ROWS = 2048
# Tests on CPU monkeypatch this to True (pallas interpreter mode).
INTERPRET = False  # 2048 x 128 bf16 = 512 KiB per input block


def _pack_geometry(n: int, c: int):
    """Rows of 128 lanes holding F=128//C voxels each; n must divide."""
    if 128 % c != 0:
        fold = 1
        lanes = c
    else:
        fold = 128 // c
        lanes = 128
    rows = n // fold
    if rows * fold != n:
        return None  # caller pads
    return rows, lanes, fold


def _sum_kernel(x_ref, out_ref):
    """Accumulate per-lane [sum; sumsq] over row chunks. Grid: (chunks,)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...].astype(jnp.float32)
    out_ref[0, :] += jnp.sum(x, axis=0)
    out_ref[1, :] += jnp.sum(x * x, axis=0)


def _apply_kernel(x_ref, mean_ref, inv_ref, scale_ref, bias_ref, out_ref):
    x = x_ref[...].astype(jnp.float32)
    y = (x - mean_ref[0, :]) * inv_ref[0, :] * scale_ref[0, :] \
        + bias_ref[0, :]
    out_ref[...] = y.astype(out_ref.dtype)


def _grad_sum_kernel(g_ref, x_ref, mean_ref, inv_ref, out_ref):
    """Accumulate per-lane [sum(g); sum(g * xhat)]."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = g_ref[...].astype(jnp.float32)
    xhat = (x_ref[...].astype(jnp.float32) - mean_ref[0, :]) * inv_ref[0, :]
    out_ref[0, :] += jnp.sum(g, axis=0)
    out_ref[1, :] += jnp.sum(g * xhat, axis=0)


def _dx_kernel(g_ref, x_ref, mean_ref, inv_ref, scale_ref, red_ref,
               out_ref):
    """dx = scale*inv*(g - dbias/N - xhat*dscale/N); red = [dbias;dscale]/N."""
    g = g_ref[...].astype(jnp.float32)
    xhat = (x_ref[...].astype(jnp.float32) - mean_ref[0, :]) * inv_ref[0, :]
    dx = (scale_ref[0, :] * inv_ref[0, :]
          * (g - red_ref[0, :] - xhat * red_ref[1, :]))
    out_ref[...] = dx.astype(out_ref.dtype)


def _chunked(rows: int, lanes: int = _LANES):
    # keep blocks ~512 KiB regardless of channel width (wide layers would
    # otherwise exceed the scoped VMEM budget once double-buffered)
    target_rows = max(8, (_CHUNK_ROWS * _LANES) // lanes)
    chunk = min(target_rows, rows)
    n_chunks = pl.cdiv(rows, chunk)
    return chunk, n_chunks


def _pad_rows(x2, chunk, n_chunks):
    pad = chunk * n_chunks - x2.shape[0]
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    return x2


def _lane_stats(x2, rows, lanes, fold, n_valid_rows_total):
    """One streamed pass -> per-lane [sum; sumsq] (f32)."""
    chunk, n_chunks = _chunked(rows, lanes)
    x2 = _pad_rows(x2, chunk, n_chunks)
    out = pl.pallas_call(
        _sum_kernel,
        out_shape=jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((2, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(x2)
    return out


def _fold_lanes(v, c, fold):
    """(lanes,) per-lane partials -> (c,) per-channel totals."""
    if fold == 1:
        return v
    return v.reshape(fold, c).sum(axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def batch_norm_train(x2, scale, bias, eps: float = 1e-5):
    y, mean, var = _bn_fwd_impl(x2, scale, bias, eps)
    return y, mean, var


def _bn_fwd_impl(x2, scale, bias, eps):
    n, c = x2.shape
    geom = _pack_geometry(n, c)
    assert geom is not None, (n, c)
    rows, lanes, fold = geom
    xp = x2.reshape(rows, lanes)

    sums = _lane_stats(xp, rows, lanes, fold, n)
    total = _fold_lanes(sums[0], c, fold)
    total_sq = _fold_lanes(sums[1], c, fold)
    nf = jnp.float32(n)
    mean = total / nf
    var = total_sq / nf - mean * mean  # biased (torch normalization var)
    inv = jax.lax.rsqrt(var + eps)

    chunk, n_chunks = _chunked(rows, lanes)
    xp_p = _pad_rows(xp, chunk, n_chunks)
    mean_l = jnp.tile(mean, fold)[None, :]
    inv_l = jnp.tile(inv, fold)[None, :]
    scale_l = jnp.tile(scale.astype(jnp.float32), fold)[None, :]
    bias_l = jnp.tile(bias.astype(jnp.float32), fold)[None, :]

    vec = lambda: pl.BlockSpec((1, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        _apply_kernel,
        out_shape=jax.ShapeDtypeStruct(xp_p.shape, x2.dtype),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec(), vec(), vec(), vec()],
        out_specs=pl.BlockSpec((chunk, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(xp_p, mean_l, inv_l, scale_l, bias_l)
    y = y[:rows].reshape(n, c)
    return y, mean, var


def _bn_fwd(x2, scale, bias, eps):
    y, mean, var = _bn_fwd_impl(x2, scale, bias, eps)
    return (y, mean, var), (x2, scale, mean, var)


def _bn_bwd(eps, residuals, cotangents):
    gy, _, _ = cotangents  # gradients w.r.t. (y, mean, var); stats unused
    x2, scale, mean, var = residuals
    n, c = x2.shape
    rows, lanes, fold = _pack_geometry(n, c)
    inv = jax.lax.rsqrt(var + eps)

    xp = x2.reshape(rows, lanes)
    gp = gy.reshape(rows, lanes)
    chunk, n_chunks = _chunked(rows, lanes)
    xp_p = _pad_rows(xp, chunk, n_chunks)
    gp_p = _pad_rows(gp, chunk, n_chunks)

    mean_l = jnp.tile(mean, fold)[None, :]
    inv_l = jnp.tile(inv, fold)[None, :]

    vec = lambda: pl.BlockSpec((1, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    sums = pl.pallas_call(
        _grad_sum_kernel,
        out_shape=jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec(), vec()],
        out_specs=pl.BlockSpec((2, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(gp_p, xp_p, mean_l, inv_l)
    dbias = _fold_lanes(sums[0], c, fold)
    dscale = _fold_lanes(sums[1], c, fold)

    nf = jnp.float32(n)
    red = jnp.stack([jnp.tile(dbias / nf, fold),
                     jnp.tile(dscale / nf, fold)])
    scale_l = jnp.tile(scale.astype(jnp.float32), fold)[None, :]

    dx = pl.pallas_call(
        _dx_kernel,
        out_shape=jax.ShapeDtypeStruct(xp_p.shape, x2.dtype),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((chunk, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((chunk, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  vec(), vec(), vec(),
                  pl.BlockSpec((2, lanes), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
    )(gp_p, xp_p, mean_l, inv_l, scale_l, red)
    dx = dx[:rows].reshape(n, c)
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


batch_norm_train.defvjp(_bn_fwd, _bn_bwd)


def fused_batch_norm(x, scale, bias, eps: float = 1e-5):
    """Training-mode BN on (..., C) activations via the Pallas kernels."""
    shape = x.shape
    c = shape[-1]
    n = 1
    for s in shape[:-1]:
        n *= s
    y, mean, var = batch_norm_train(x.reshape(n, c), scale, bias, eps)
    return y.reshape(shape), mean, var


import flax.linen as nn  # noqa: E402


class FusedBatchNorm(nn.Module):
    """flax module drop-in for ``nn.BatchNorm`` (same param/stat trees).

    Training mode runs the Pallas kernels; eval mode is plain XLA with the
    running statistics. Single-chip only: a pallas_call does not partition
    under GSPMD, so multi-chip data parallelism should keep flax BN (the
    backbone's ``fused_bn`` flag defaults to False).
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,),
                               jnp.float32)

        if self.use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            y = ((x.astype(self.dtype) - ra_mean.value.astype(self.dtype))
                 * (inv * scale).astype(self.dtype)
                 + bias.astype(self.dtype))
            return y

        y, mean, var = fused_batch_norm(x.astype(self.dtype), scale, bias,
                                        self.epsilon)
        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return y


# --------------------------------------------------------------------- #
# Hybrid BN: Pallas for the statistics REDUCE only; the normalize/apply
# stays in XLA so it keeps fusing into neighboring conv epilogues (the
# failure mode of the fully-fused FusedBatchNorm above). The stats VJP is
# closed-form elementwise (d mean = g/N; d var = 2(x-mean)g/N) which XLA
# fuses into the existing BN backward chain, while the forward reduce runs
# through the lane-packed kernel.
#
# MEASURED OUTCOME (v5e, ResNet-18 3D @ 91^3, batch 128): 273 vol/s vs
# 320 vol/s with flax BN — still slower. Even the stats-only extraction
# breaks XLA's fusion of the reduce with its producer; XLA's BN lowering
# is already near-optimal here. Kept as a correctness-tested option; the
# conclusion for this workload is: don't fight XLA's BN.
# --------------------------------------------------------------------- #


@jax.custom_vjp
def lane_packed_stats(x2):
    """(N, C) -> (mean, var) per channel, f32 (biased variance)."""
    return _lane_packed_stats_impl(x2)


def _lane_packed_stats_impl(x2):
    n, c = x2.shape
    geom = _pack_geometry(n, c)
    assert geom is not None, (n, c)
    rows, lanes, fold = geom
    sums = _lane_stats(x2.reshape(rows, lanes), rows, lanes, fold, n)
    total = _fold_lanes(sums[0], c, fold)
    total_sq = _fold_lanes(sums[1], c, fold)
    nf = jnp.float32(n)
    mean = total / nf
    var = total_sq / nf - mean * mean
    return mean, var


def _lps_fwd(x2):
    mean, var = _lane_packed_stats_impl(x2)
    return (mean, var), (x2, mean)


def _lps_bwd(residuals, cotangents):
    x2, mean = residuals
    gmean, gvar = cotangents
    n = jnp.float32(x2.shape[0])
    # d mean/dx = 1/N; d var/dx = 2 (x - mean) / N  (biased variance)
    dx = (gmean / n
          + (2.0 / n) * gvar * (x2.astype(jnp.float32) - mean))
    return (dx.astype(x2.dtype),)


lane_packed_stats.defvjp(_lps_fwd, _lps_bwd)


class HybridBatchNorm(nn.Module):
    """nn.BatchNorm drop-in: Pallas lane-packed statistics reduce + XLA
    apply (keeps conv-epilogue fusion). Same param/stat trees as flax."""

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                nn.initializers.zeros, None, (c,),
                                jnp.float32)
        ra_var = self.variable("batch_stats", "var",
                               nn.initializers.ones, None, (c,),
                               jnp.float32)
        x = x.astype(self.dtype)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            n = 1
            for s in x.shape[:-1]:
                n *= s
            mean, var = lane_packed_stats(x.reshape(n, c))
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum)
                                 * jax.lax.stop_gradient(mean))
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum)
                                * jax.lax.stop_gradient(var))
        inv = jax.lax.rsqrt(var + self.epsilon)
        y = ((x - mean.astype(self.dtype))
             * (inv * scale).astype(self.dtype) + bias.astype(self.dtype))
        return y
