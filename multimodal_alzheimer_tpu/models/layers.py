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
    if min(x.shape[1:4]) < window:
        # torch.nn.MaxPool3d raises "output size ... too small" here; the
        # VALID-window pool would instead emit a zero-size tensor whose
        # GAP silently turns the whole model NaN (deep conv ladders on
        # volumes smaller than 2^n_blocks).
        raise ValueError(
            f"max_pool3d: spatial dims {x.shape[1:4]} smaller than the "
            f"{window}^3 window — the conv tower is too deep for this "
            f"volume size")
    stride = stride or window
    return nn.max_pool(x, (window,) * 3, strides=(stride,) * 3,
                       padding="VALID")


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool3d(1) + Flatten: (B, D, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2, 3))


def traced_dropout(module: nn.Module, x: jnp.ndarray, rate,
                   dtype) -> jnp.ndarray:
    """Dropout whose rate is a runtime (traced) value.

    Same masking semantics as ``nn.Dropout`` in train mode — bernoulli
    keep mask, survivors scaled by 1/keep — but with ``rate`` traced, so
    ``jax.vmap`` can train K HPO trials with K different rates in one
    program (train/vmap_hpo.py). ``rate == 0.0`` keeps everything and
    divides by 1.0: bit-exact to applying no dropout (it only consumes
    one ``make_rng`` fold). Caller gates on train mode.
    """
    keep = 1.0 - jnp.asarray(rate, jnp.float32)
    rng = module.make_rng("dropout")
    mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
    return jnp.where(mask, x / keep.astype(dtype), 0.0)


def _s2d_pool_widx(k: int):
    """Per-dim (3 taps, s, r) -> w index map; -1 marks a zero tap.

    Parity decomposition of a stride-1 odd-k conv under a following
    stride-2 window: output position u = 2p + r, input u + off =
    2(p + m) + s with m in {-1, 0, 1}, so tap (m, s, r) reads
    w[2m + s - r + (k-1)//2] when that index is in range.
    """
    import numpy as np

    half = (k - 1) // 2
    idx = np.full((3, 2, 2), -1, np.int64)
    for a in range(3):
        for s in range(2):
            for r in range(2):
                w = 2 * (a - 1) + s + half - r
                if 0 <= w < k:
                    idx[a, s, r] = w
    return idx


def _s2d_flat_index(k: int):
    """(3,3,3, 8s, 8r) flat gather map into w's k^3 spatial slots (+zero)."""
    import numpy as np

    i = _s2d_pool_widx(k)
    d = i[:, None, None, :, None, None, :, None, None]
    h = i[None, :, None, None, :, None, None, :, None]
    w = i[None, None, :, None, None, :, None, None, :]
    valid = (d >= 0) & (h >= 0) & (w >= 0)
    flat = np.where(valid, d * k * k + h * k + w, k ** 3)
    return flat.reshape(3, 3, 3, 8, 8)  # (taps, s-parity, r-parity)


class S2DConvReLUPool(nn.Module):
    """Fused Conv3d(odd k, stride 1, 'same') -> ReLU -> MaxPool(2), exact.

    The direct form is XLA-hostile for small channel counts: the
    pet_3d_cnn profile measured its 5^3 C_in=1 conv at 91^3 taking
    168 ms/step of the 210 ms total (~20x above both its MXU and HBM
    bounds — there is no efficient emitter for single-channel stride-1
    convs). The same parity decomposition that won the MRI stem +19%
    (resnet3d.py s2d stem) applies around a pool: space-to-depth the
    input (factor 2 -> 8C channels), gather the k^3 kernel into a 3^3
    x (8C -> 8F) kernel indexed by (input parity s, output parity r),
    run ONE MXU-friendly conv, then ReLU and max-reduce over the 8
    output parities — algebraically the conv at every original position
    followed by the 2^3 max window (ReLU commutes with max). Odd extents
    zero-pad to even; the pool's floor semantics slice the tail off, so
    padding never reaches the output. Parameter tree matches nn.Conv
    ('kernel'/'bias', same shapes/inits) — checkpoints interoperate with
    the unfused path bit-for-bit.

    Numerics: same products, different summation grouping -> low-bit
    accumulation differences only (parity-tested vs the naive path incl.
    gradients). Max-tie gradient routing can differ from
    SelectAndScatter only on exactly-equal positive values (relu-zero
    ties route zero gradient either way).
    """

    features: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32
    # parity_out=True returns the conv+bias result in parity layout
    # (B, ceil(D/2), ceil(H/2), ceil(W/2), 8, F) — ALL conv output
    # positions, symmetric padding, no ReLU/max — so a BatchNorm can
    # take exact full-tensor statistics before the pool
    # (ParityBatchNorm + parity_pool in ConvBlock3D). Odd extents carry
    # one garbage plane per odd dim (parity r=1 of the last row, fed
    # purely by the zero pad); parity_valid_mask marks them.
    parity_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        assert k % 2 == 1, "parity decomposition needs odd kernels"
        b, d, h, w, cin = x.shape
        if min(d, h, w) < 2:
            # Same guard as layers.max_pool3d: a 2^3 pool on a size-1 dim
            # would emit a zero-size tensor (silent NaN downstream).
            raise ValueError(
                f"S2DConvReLUPool: spatial dims {(d, h, w)} smaller than "
                f"the 2^3 pool window — the conv tower is too deep for "
                f"this volume size")
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, k, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)

        # inputs: zero-pad to even extents, space-to-depth (s-major, cin-minor)
        dp, hp, wp = d + d % 2, h + h % 2, w + w % 2
        xe = jnp.pad(x, ((0, 0), (0, dp - d), (0, hp - h), (0, wp - w),
                         (0, 0)))
        X = xe.reshape(b, dp // 2, 2, hp // 2, 2, wp // 2, 2, cin)
        X = X.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, dp // 2, hp // 2, wp // 2, 8 * cin)

        # kernel: gather w taps into (3,3,3, 8*cin, 8*features)
        wf = kernel.reshape(k ** 3, cin, self.features)
        wf = jnp.concatenate(
            [wf, jnp.zeros((1, cin, self.features), kernel.dtype)], axis=0)
        W = wf[_s2d_flat_index(k)]     # (3,3,3, 8s, 8r, cin, features)
        W = W.transpose(0, 1, 2, 3, 5, 4, 6).reshape(
            3, 3, 3, 8 * cin, 8 * self.features)

        # Asymmetric padding emits ONLY the pool positions the floor
        # semantics keep — outputs 0..dim//2-1 need s2d rows -1..dim//2,
        # so lo=1 always and hi=1 only when dim is even (odd dims gained
        # a zero row in the input pad above, so row dim//2 already
        # exists). Equivalent to SAME + the tail slice, minus the
        # materialized slice pass (profiled 0.7 ms/128 at 91^3 serve —
        # and its backward pad in training). parity_out needs every conv
        # position (BN statistics), so it pads symmetrically instead.
        if self.parity_out:
            pad = ((1, 1),) * 3
        else:
            pad = tuple((1, 0 if dim % 2 else 1) for dim in (d, h, w))
        out = jax.lax.conv_general_dilated(
            X.astype(self.dtype), W.astype(self.dtype),
            window_strides=(1, 1, 1), padding=pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        if self.parity_out:
            out = out.reshape(b, dp // 2, hp // 2, wp // 2, 8,
                              self.features)
            return out + bias.astype(self.dtype)
        out = out.reshape(b, d // 2, h // 2, w // 2, 8, self.features)
        out = nn.relu(out + bias.astype(self.dtype))
        return jnp.max(out, axis=4)


def parity_valid_mask(spatial: Sequence[int]) -> jnp.ndarray:
    """(ceil(D/2), ceil(H/2), ceil(W/2), 8) float mask of real conv
    positions in a ``parity_out`` tensor — 0 marks the garbage plane an
    odd extent gains (parity r=1 of its last row reads only the zero
    pad). Parity axis order matches the fused conv: rd*4 + rh*2 + rw."""
    import numpy as np

    per_dim = []
    for dim in spatial:
        rows = (dim + 1) // 2
        m = np.ones((rows, 2), np.float32)
        if dim % 2:
            m[rows - 1, 1] = 0.0
        per_dim.append(m)
    md, mh, mw = per_dim
    mask = (md[:, None, None, :, None, None]
            * mh[None, :, None, None, :, None]
            * mw[None, None, :, None, None, :])
    return jnp.asarray(mask.reshape(md.shape[0], mh.shape[0],
                                    mw.shape[0], 8))


def parity_pool(y: jnp.ndarray, spatial: Sequence[int]) -> jnp.ndarray:
    """MaxPool(2, floor) of a ``parity_out`` tensor: keep the rows the
    floor semantics keep (dim//2 — drops the odd-extent tail row and
    with it every garbage plane), then max over the 8 parities."""
    d, h, w = spatial
    return jnp.max(y[:, :d // 2, :h // 2, :w // 2], axis=4)


class ParityBatchNorm(nn.Module):
    """BatchNorm over a ``parity_out`` tensor — exact naive-path stats.

    The parity layout holds every conv output position exactly once
    (plus masked garbage planes on odd extents), so masked moments equal
    the naive path's full pre-pool statistics up to summation order.
    Variable tree matches ``nn.BatchNorm`` (``batch_stats/{mean,var}``,
    ``params/{scale,bias}``) so checkpoints interoperate with the
    unfused path. ``torch_stats`` mirrors :class:`TorchStatsBatchNorm`'s
    Bessel-corrected running-variance EMA (PARITY.md divergence 3).

    Like TorchStatsBatchNorm, the Bessel/stat count ``n_valid`` is the
    static element count of the GLOBAL logical batch — correct under
    GSPMD data parallelism (jit shapes are global; the masked sums
    reduce across shards via compiler-inserted collectives).
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    torch_stats: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 n_valid: int) -> jnp.ndarray:
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
            mf = mask[None, ..., None].astype(jnp.float32)
            xf = x.astype(jnp.float32) * mf
            inv_n = jnp.float32(1.0 / n_valid)
            mean = jnp.sum(xf, axes) * inv_n
            var = jnp.sum(jnp.square(x.astype(jnp.float32)) * mf,
                          axes) * inv_n - jnp.square(mean)
            if not self.is_initializing():
                batch_var = var
                if self.torch_stats:
                    batch_var = var * jnp.float32(
                        n_valid / max(n_valid - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * batch_var)
        dtype = self.dtype or x.dtype
        mul = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(dtype)
        return (x.astype(dtype) - mean.astype(dtype)) * mul \
            + bias.astype(dtype)


class ConvBlock3D(nn.Module):
    """Conv3d('same') -> [BN] -> ReLU -> MaxPool(2) -> [Dropout]."""

    features: int
    kernel_size: int
    use_batchnorm: bool = False
    dropout_p: Optional[float] = None
    dtype: jnp.dtype = jnp.float32
    bn_torch_stats: bool = False
    # Fused parity-decomposed conv+relu+pool (S2DConvReLUPool): exact,
    # checkpoint-compatible, and the only efficient lowering for the
    # small-channel stride-1 convs (pet_3d_cnn: 597 -> see bench --all).
    # BatchNorm blocks fuse too: the parity_out layout holds every conv
    # position, so ParityBatchNorm takes exact masked full-tensor stats
    # before the pool (reference order Conv -> BN -> ReLU -> MaxPool,
    # pet_cnn.py:17-28).
    s2d_pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rate=None):
        # cin <= 8 is the measured crossover (v5e, 91^3-class grids):
        # fused wins 168 -> 22 ms at cin=1 and 38 -> 23 ms at cin=8, but
        # LOSES at cin>=16 (2.3 -> 8.6 ms: the naive conv already runs at
        # good MXU shapes there and the 8x tap padding dominates).
        fused = (self.s2d_pool and self.kernel_size % 2 == 1
                 and x.shape[-1] <= 8)
        if fused and not self.use_batchnorm:
            x = S2DConvReLUPool(self.features, self.kernel_size,
                                self.dtype, name="conv")(x)
        elif fused:
            b, d, h, w = x.shape[:4]
            y = S2DConvReLUPool(self.features, self.kernel_size,
                                self.dtype, parity_out=True,
                                name="conv")(x)
            y = ParityBatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5,
                                dtype=self.dtype,
                                torch_stats=self.bn_torch_stats,
                                name="bn")(
                y, parity_valid_mask((d, h, w)), b * d * h * w)
            x = parity_pool(nn.relu(y), (d, h, w))
        else:
            x = nn.Conv(self.features, (self.kernel_size,) * 3,
                        padding="SAME", dtype=self.dtype, name="conv")(x)
            if self.use_batchnorm:
                x = batch_norm(train, "bn", self.dtype,
                               self.bn_torch_stats)(x)
            x = nn.relu(x)
            x = max_pool3d(x)
        if dropout_rate is not None:
            # Traced-rate override (vectorized HPO, train/vmap_hpo.py):
            # same bernoulli-keep/rescale semantics as nn.Dropout but with
            # the rate a runtime value; rate 0.0 is bit-exact no-dropout.
            if train:
                x = traced_dropout(self, x, dropout_rate, self.dtype)
        elif self.dropout_p is not None:
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
    s2d_pool: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False, dropout_rate=None):
        for i, (features, kernel) in enumerate(
                zip(self.conv_out, self.filter_size)):
            x = ConvBlock3D(features, kernel, self.use_batchnorm,
                            self.dropout_p, self.dtype,
                            self.bn_torch_stats, self.s2d_pool,
                            name=f"block_{i}")(x, train,
                                               dropout_rate=dropout_rate)
        return x
