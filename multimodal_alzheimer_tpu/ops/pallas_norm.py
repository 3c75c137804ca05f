"""Fused Pallas TPU kernels for per-scan volume normalization.

A 91x109x91 float32 volume (3.6 MB) plus its mask does NOT fit in VMEM
(~16 MB/core) once double-buffered, so the kernels *stream*: volumes stay
in HBM and the kernel drives its own double-buffered DMA pipeline over row
chunks — the canonical TPU pattern (see pallas guide: Async DMA / Double
Buffering).

``per_scan_zscore`` is ONE kernel launch per batch doing two streamed
passes per scan:
  pass 1: accumulate count / sum / sum-of-squares of the nonzero masked
          voxels (chunk partials reduced on the VPU),
  pass 2: normalize ``(x - mean) / std * mask`` and DMA chunks back out.
HBM traffic: 2 reads + 1 write of the volume (the unfused XLA fallback in
``ops/normalization.py`` does 3 reads + 1 write across separate HLOs).

The reference performs the equivalent math per-sample in host Python
workers (reference: pkg/utils/dataloader.py:244-270). Bessel-corrected
variance matches ``torch.std_mean``.

``minmax_apply`` fuses scale -> clamp[0,1] -> remask for the quantile
min-max path (exact quantiles come from the XLA sort in ``ops/quantile``).

Layout: volumes are flattened and zero-padded to (rows, 128) float32
tiles. Zero padding is semantically free: zeros are excluded from the
statistics by the nonzero rule and multiplied back to zero on output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
_CHUNK_ROWS = 1024  # 1024 x 128 f32 = 512 KiB per buffer


def _padded_rows(n_elems: int) -> int:
    rows = pl.cdiv(n_elems, _LANES)
    return ((rows + _SUBLANES - 1) // _SUBLANES) * _SUBLANES


def _to_tiles(flat: jnp.ndarray, rows: int) -> jnp.ndarray:
    pad = rows * _LANES - flat.shape[-1]
    flat = jnp.pad(flat, [(0, 0)] * (flat.ndim - 1) + [(0, pad)])
    return flat.reshape(*flat.shape[:-1], rows, _LANES)


def _zscore_stream_kernel(vol_hbm, mask_hbm, out_hbm,
                          vbuf, mbuf, obuf, acc, sems, out_sems):
    """Grid (B,). All big refs live in HBM/ANY; chunks stream via DMA."""
    b = pl.program_id(0)
    rows = vol_hbm.shape[1]
    n_chunks = rows // _CHUNK_ROWS

    def chunk_in(buf_set, slot, c):
        src = vol_hbm if buf_set == 0 else mask_hbm
        dst = vbuf if buf_set == 0 else mbuf
        return pltpu.make_async_copy(
            src.at[b, pl.ds(c * _CHUNK_ROWS, _CHUNK_ROWS), :],
            dst.at[slot], sems.at[buf_set, slot])

    # ---- pass 1: streamed masked statistics ----
    acc[0, 0] = 0.0  # count
    acc[0, 1] = 0.0  # sum
    acc[0, 2] = 0.0  # sum of squares
    chunk_in(0, 0, 0).start()
    chunk_in(1, 0, 0).start()

    def stats_body(c, _):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_in(0, nxt, c + 1).start()
            chunk_in(1, nxt, c + 1).start()

        chunk_in(0, slot, c).wait()
        chunk_in(1, slot, c).wait()
        vals = vbuf[slot] * mbuf[slot]
        valid = (vals != 0.0).astype(jnp.float32)
        acc[0, 0] += jnp.sum(valid)
        acc[0, 1] += jnp.sum(vals)
        acc[0, 2] += jnp.sum(vals * vals)
        return 0

    jax.lax.fori_loop(0, n_chunks, stats_body, 0)

    n = acc[0, 0]
    mean = acc[0, 1] / n
    # Bessel-corrected: var = (sum_sq - n*mean^2) / (n - 1)
    var = (acc[0, 2] - n * mean * mean) / (n - 1.0)
    inv_std = jax.lax.rsqrt(var)

    # ---- pass 2: streamed normalize + remask + write ----
    chunk_in(0, 0, 0).start()
    chunk_in(1, 0, 0).start()

    def chunk_out(slot, c):
        return pltpu.make_async_copy(
            obuf.at[slot],
            out_hbm.at[b, pl.ds(c * _CHUNK_ROWS, _CHUNK_ROWS), :],
            out_sems.at[slot])

    def apply_body(c, _):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_in(0, nxt, c + 1).start()
            chunk_in(1, nxt, c + 1).start()

        chunk_in(0, slot, c).wait()
        chunk_in(1, slot, c).wait()

        @pl.when(c >= 2)
        def _():
            chunk_out(slot, c - 2).wait()

        obuf[slot] = (vbuf[slot] - mean) * inv_std * mbuf[slot]
        chunk_out(slot, c).start()
        return 0

    jax.lax.fori_loop(0, n_chunks, apply_body, 0)
    chunk_out(jax.lax.rem(n_chunks - 1, 2), n_chunks - 1).wait()

    @pl.when(n_chunks >= 2)
    def _():
        chunk_out(jax.lax.rem(n_chunks - 2, 2), n_chunks - 2).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def per_scan_zscore(volume: jnp.ndarray, mask: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused per-scan z-score over nonzero brain voxels (batched).

    Args:
      volume: (B, ...) float32 volumes.
      mask: (B, ...) binary masks, same shape.
      interpret: run in interpreter mode (CPU testing).

    Returns:
      ((x - mean)/std) * mask with statistics over {x*mask != 0}
      (reference: dataloader.py:252-260).

    Precision note: the streamed statistics use the shifted-free
    sum-of-squares form accumulated in fp32; for ADNI-range intensities
    this agrees with the two-pass XLA fallback to ~1e-5 relative.
    """
    shape = volume.shape
    b = shape[0]
    n_elems = 1
    for s in shape[1:]:
        n_elems *= s
    rows = _padded_rows(n_elems)
    # round rows up to a multiple of the streaming chunk
    rows = ((rows + _CHUNK_ROWS - 1) // _CHUNK_ROWS) * _CHUNK_ROWS
    vol_t = _to_tiles(volume.reshape(b, n_elems).astype(jnp.float32), rows)
    mask_t = _to_tiles(mask.reshape(b, n_elems).astype(jnp.float32), rows)

    out = pl.pallas_call(
        _zscore_stream_kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, _LANES), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, _CHUNK_ROWS, _LANES), jnp.float32),  # vol bufs
            pltpu.VMEM((2, _CHUNK_ROWS, _LANES), jnp.float32),  # mask bufs
            pltpu.VMEM((2, _CHUNK_ROWS, _LANES), jnp.float32),  # out bufs
            pltpu.SMEM((1, 4), jnp.float32),                    # accum
            pltpu.SemaphoreType.DMA((2, 2)),                    # in sems
            pltpu.SemaphoreType.DMA((2,)),                      # out sems
        ],
        interpret=interpret,
    )(vol_t, mask_t)
    return out.reshape(b, rows * _LANES)[:, :n_elems].reshape(shape)


def _minmax_apply_kernel(q_ref, vol_ref, mask_ref, out_ref):
    i = pl.program_id(0)
    qmin = q_ref[i, 0]
    qmax = q_ref[i, 1]
    x = (vol_ref[0] - qmin) / (qmax - qmin)
    x = jnp.clip(x, 0.0, 1.0)
    out_ref[0] = x * mask_ref[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def minmax_apply(volume: jnp.ndarray, mask: jnp.ndarray,
                 qmin: jnp.ndarray, qmax: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """Fused (x-qmin)/(qmax-qmin) -> clamp[0,1] -> remask (batched).

    ``qmin``/``qmax`` are (B,) per-scan quantiles (from
    ``ops.quantile.masked_nonzero_quantile``). Elementwise, so the grid
    chunks rows; Mosaic double-buffers the (1, CHUNK, 128) blocks within
    the VMEM budget.
    """
    shape = volume.shape
    b = shape[0]
    n_elems = 1
    for s in shape[1:]:
        n_elems *= s
    rows = _padded_rows(n_elems)
    chunk = min(_CHUNK_ROWS, rows)
    rows = ((rows + chunk - 1) // chunk) * chunk
    n_chunks = rows // chunk
    vol_t = _to_tiles(volume.reshape(b, n_elems).astype(jnp.float32), rows)
    mask_t = _to_tiles(mask.reshape(b, n_elems).astype(jnp.float32), rows)
    q = jnp.stack([qmin.astype(jnp.float32), qmax.astype(jnp.float32)],
                  axis=1)  # (B, 2)

    out = pl.pallas_call(
        _minmax_apply_kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, _LANES), jnp.float32),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # full (B, 2) quantiles
            pl.BlockSpec((1, chunk, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, _LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, _LANES), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(q, vol_t, mask_t)
    return out.reshape(b, rows * _LANES)[:, :n_elems].reshape(shape)
