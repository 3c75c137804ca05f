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

MEASURED DEAD END (round 3): int16-packed compares for the selection's
top-16 bit passes (compare ``keys >> 16`` as int16 at 2x VPU lane
density — exact, since those passes' candidates have zero low bits;
projected 34 -> ~25 ms). Mosaic REJECTS int16 vector comparisons on
this toolchain: ``arith.cmpi (vector<8x128x2xi16>) -> Target does not
support this comparison`` — same limitation class as the missing
unsigned compares. Don't reopen unless Mosaic gains sub-32-bit vector
cmp support.
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
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
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


def _key_chunk(vol, msk):
    """Masked values -> order-preserving int32 radix keys (signed order).

    ``k = b ^ ((b >> 31) & 0x7FFFFFFF)`` (arithmetic shift) maps float32
    bit patterns to int32s whose SIGNED order equals the float order
    (negatives get their magnitude bits flipped). Invalid voxels (zero
    after masking, incl. tile padding) become INT32_MAX so every valid
    key sorts strictly below them.
    """
    vals = vol * msk
    valid = vals != 0.0
    b = jax.lax.bitcast_convert_type(vals, jnp.int32)
    k = b ^ ((b >> 31) & jnp.int32(0x7FFFFFFF))
    return jnp.where(valid, k, jnp.int32(0x7FFFFFFF)), valid


def _chunked_reduce(keys_ref, n_chunks, chunk, fn, init):
    """fn(block, carry) partial-reduce over row chunks of the VMEM keys.

    Whole-buffer (rows, 128) vector temporaries blow past VMEM next to
    the ~4 MB key buffer itself (measured: the Mosaic compile wedges for
    >25 min at 91^3 shapes); chunking keeps every temporary <= ~512 KiB.
    """
    def body(c, s):
        return fn(keys_ref[pl.ds(c * chunk, chunk), :], s)

    return jax.lax.fori_loop(0, n_chunks, body, init)


_SIGN = -0x80000000  # int32 sign bit; ^ _SIGN biases signed <-> unsigned


def _radix_select_multi(keys_ref, n_chunks, chunk, ts):
    """Signed keys of the (0-indexed) ``ts[j]``-th smallest entries.

    MSB-first successive approximation per target: tentatively set each
    bit of the answer (constructed in the sign-biased space where unsigned
    bit-pattern order == value order) and keep it iff the count of keys
    strictly below the candidate is <= t — one signed LESS-THAN compare
    plus one add per element per bit (Mosaic has no unsigned compares;
    candidates are un-biased to scalars before the vector compare). All
    targets share each chunk read. ``ts`` are int32 scalar ranks.
    """
    nq = len(ts)

    def bit_body(i, ps):
        bit = 31 - i
        cands = tuple(p | (jnp.int32(1) << bit) for p in ps)
        c_signed = tuple(c ^ jnp.int32(_SIGN) for c in cands)

        def red(blk, s):
            return tuple(
                s[j] + jnp.sum((blk < c_signed[j]).astype(jnp.int32))
                for j in range(nq))

        cnts = _chunked_reduce(keys_ref, n_chunks, chunk, red,
                               (jnp.int32(0),) * nq)
        return tuple(jnp.where(cnts[j] <= ts[j], cands[j], ps[j])
                     for j in range(nq))

    ps = jax.lax.fori_loop(0, 32, bit_body, (jnp.int32(0),) * nq)
    return tuple(p ^ jnp.int32(_SIGN) for p in ps)  # back to signed keys


def _minmax_select_kernel(qs_smem, vol_hbm, mask_hbm, out_ref,
                          vbuf, mbuf, keys, acc, sems):
    """Grid (B,). Exact per-scan quantile keys via VMEM-resident radix select.

    Phase 1 streams vol*mask chunks (double-buffered DMA), materializing
    the radix keys in VMEM and counting valid voxels. Phase 2 runs the
    32-pass selection per requested rank over the VMEM keys — zero extra
    HBM traffic. Output row layout (int32): [n, k_lo(q0), k_hi(q0),
    k_lo(q1), k_hi(q1), ...]; the monotone-key inverse + linear
    interpolation happen outside in XLA on (B, Q) scalars.
    """
    b = pl.program_id(0)
    rows = vol_hbm.shape[1]
    chunk = vbuf.shape[1]
    n_chunks = rows // chunk
    n_qs = qs_smem.shape[0]

    def chunk_in(buf_set, slot, c):
        src = vol_hbm if buf_set == 0 else mask_hbm
        dst = vbuf if buf_set == 0 else mbuf
        return pltpu.make_async_copy(
            src.at[b, pl.ds(c * chunk, chunk), :],
            dst.at[slot], sems.at[buf_set, slot])

    acc[0, 0] = 0.0  # valid-voxel count
    chunk_in(0, 0, 0).start()
    chunk_in(1, 0, 0).start()

    def keys_body(c, _):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            chunk_in(0, nxt, c + 1).start()
            chunk_in(1, nxt, c + 1).start()

        chunk_in(0, slot, c).wait()
        chunk_in(1, slot, c).wait()
        k, valid = _key_chunk(vbuf[slot], mbuf[slot])
        keys[pl.ds(c * chunk, chunk), :] = k
        acc[0, 0] += jnp.sum(valid.astype(jnp.float32))
        return 0

    jax.lax.fori_loop(0, n_chunks, keys_body, 0)

    n = acc[0, 0]
    out = jnp.zeros((_SUBLANES, _LANES), jnp.int32)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 1)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (_SUBLANES, _LANES), 0)

    def put(lane, value):
        return jnp.where((rows_i == 0) & (lanes == lane), value, 0)

    out += put(0, jax.lax.convert_element_type(n, jnp.int32))

    # torch.quantile rank arithmetic (matches ops/quantile.py: f32).
    los = [jnp.floor(qs_smem[qi] * (n - 1.0)) for qi in range(n_qs)]
    k_los = _radix_select_multi(
        keys, n_chunks, chunk,
        tuple(jax.lax.convert_element_type(lo, jnp.int32) for lo in los))

    # sorted[lo+1] per target, one shared pass: v_lo again if duplicates
    # cover rank lo+1, else the smallest key strictly greater; clamped to
    # the last valid rank. Signed compares == value order; invalid keys
    # (INT32_MAX) can never be <= a valid k_lo.
    def hi_red(blk, s):
        parts = []
        for j in range(n_qs):
            cnt_le, nxt = s[2 * j], s[2 * j + 1]
            parts.append(cnt_le + jnp.sum((blk <= k_los[j])
                                          .astype(jnp.int32)))
            parts.append(jnp.minimum(nxt, jnp.min(
                jnp.where(blk > k_los[j], blk, jnp.int32(0x7FFFFFFF)))))
        return tuple(parts)

    his = _chunked_reduce(
        keys, n_chunks, chunk, hi_red,
        (jnp.int32(0), jnp.int32(0x7FFFFFFF)) * n_qs)

    for j in range(n_qs):
        cnt_le, nxt = his[2 * j], his[2 * j + 1]
        lo_i = jax.lax.convert_element_type(los[j], jnp.int32)
        k_hi = jnp.where(
            (cnt_le > lo_i + 1) | (los[j] + 1.0 >= n), k_los[j], nxt)
        out += put(1 + 2 * j, k_los[j])
        out += put(2 + 2 * j, k_hi)

    out_ref[0] = out


def _minmax_apply_kernel(q_ref, vol_ref, mask_ref, out_ref):
    i = pl.program_id(0)
    qmin = q_ref[i, 0]
    qmax = q_ref[i, 1]
    x = (vol_ref[0] - qmin) / (qmax - qmin)
    x = jnp.clip(x, 0.0, 1.0)
    out_ref[0] = x * mask_ref[0]


def _pick_chunk(rows: int) -> tuple[int, int]:
    """(chunk, padded_rows): prefer a divisor chunk so the selection scans
    touch zero padded tail rows (for 91^3 -> chunk 1008, rows 7056 exactly;
    the naive 1024-multiple pad would scan 16% dead keys)."""
    c = min(_CHUNK_ROWS, rows)
    for cand in range(c, 255, -_SUBLANES):
        if rows % cand == 0:
            return cand, rows
    return c, ((rows + c - 1) // c) * c


def _tile_pair(volume: jnp.ndarray, mask: jnp.ndarray):
    b = volume.shape[0]
    n_elems = 1
    for s in volume.shape[1:]:
        n_elems *= s
    chunk, rows = _pick_chunk(_padded_rows(n_elems))
    vol_t = _to_tiles(volume.reshape(b, n_elems).astype(jnp.float32), rows)
    mask_t = _to_tiles(mask.reshape(b, n_elems).astype(jnp.float32), rows)
    return vol_t, mask_t, chunk, n_elems


def _select_tiled(vol_t, mask_t, qs: tuple, chunk: int, interpret: bool):
    """(B, Q) exact quantiles from pre-tiled (B, rows, 128) operands."""
    b = vol_t.shape[0]
    qs_arr = jnp.asarray(qs, jnp.float32)
    out = pl.pallas_call(
        _minmax_select_kernel,
        out_shape=jax.ShapeDtypeStruct((b, _SUBLANES, _LANES), jnp.int32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # qs (Q,)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, _SUBLANES, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, _LANES), jnp.float32),     # vol bufs
            pltpu.VMEM((2, chunk, _LANES), jnp.float32),     # mask bufs
            pltpu.VMEM((vol_t.shape[1], _LANES), jnp.int32),  # radix keys
            pltpu.SMEM((1, 4), jnp.float32),                 # valid count
            pltpu.SemaphoreType.DMA((2, 2)),                 # in sems
        ],
        interpret=interpret,
    )(qs_arr, vol_t, mask_t)

    # Decode: monotone-key inverse (self-inverse XOR map) + the same f32
    # linear-interpolation rank arithmetic as ops/quantile.py.
    def key_to_f32(k):
        bits = k ^ ((k >> 31) & jnp.int32(0x7FFFFFFF))
        return jax.lax.bitcast_convert_type(bits, jnp.float32)

    n = out[:, 0, 0].astype(jnp.float32)                      # (B,)
    idx = 1 + 2 * jnp.arange(len(qs))
    v_lo = key_to_f32(out[:, 0, idx])                         # (B, Q)
    v_hi = key_to_f32(out[:, 0, idx + 1])
    rank = qs_arr[None, :] * (n[:, None] - 1.0)
    frac = rank - jnp.floor(rank)
    return v_lo + frac * (v_hi - v_lo)


@functools.partial(jax.jit, static_argnames=("qs", "interpret"))
def batched_masked_quantiles(volume: jnp.ndarray, mask: jnp.ndarray,
                             qs: tuple, interpret: bool = False):
    """Exact per-scan quantiles of the nonzero masked voxels (batched).

    Exact vs ``ops.quantile.masked_nonzero_quantile`` (the XLA full-sort
    oracle): the selected order statistics are bit-identical and the final
    linear interpolation agrees to 1 ulp (XLA FMA-contraction freedom).
    9.3x faster at 91^3/batch-128 on v5e (34 ms vs
    319 ms for the fused select+apply, measured round 3): one streamed
    read of vol+mask builds order-preserving int32 radix keys in VMEM,
    then a 32-pass MSB-first binary-search selection per rank runs
    entirely on the VMEM-resident keys — one signed compare + add per
    element per bit (the sort path instead sorts ~903k f32 per scan per
    step). The remaining 34 ms is VPU compute on the 32 selection passes,
    within ~2x of the vector-unit bound; HBM traffic is ~2 ms.

    Args:
      volume: (B, ...) float32 volumes.
      mask: (B, ...) binary masks (or ones), same shape.
      qs: static tuple of quantile levels in [0, 1].
      interpret: run in interpreter mode (CPU testing).

    Returns:
      (B, len(qs)) float32, matching torch.quantile(..., 'linear') over
      the {x*mask != 0} voxel set. Requires >= 2 valid voxels per scan.
    """
    vol_t, mask_t, chunk, _ = _tile_pair(volume, mask)
    return _select_tiled(vol_t, mask_t, qs, chunk, interpret)


@functools.partial(jax.jit, static_argnames=("quantile", "interpret"))
def per_scan_minmax(volume: jnp.ndarray, mask: jnp.ndarray,
                    quantile: float = 0.99,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused quantile min-max normalization (batched, one jit).

    ``(x - Q(1-q)) / (Q(q) - Q(1-q))`` clamped to [0,1] and re-masked
    (reference: dataloader.py:261-270), with exact quantiles from the
    radix-select kernel. Tiling/padding is shared between the select and
    apply kernels so vol+mask are padded once per step.
    """
    shape = volume.shape
    b = shape[0]
    vol_t, mask_t, chunk, n_elems = _tile_pair(volume, mask)
    quants = _select_tiled(vol_t, mask_t, (quantile, 1.0 - quantile),
                           chunk, interpret)
    rows = vol_t.shape[1]
    n_chunks = rows // chunk
    q = jnp.stack([quants[:, 1], quants[:, 0]], axis=1)  # (B, 2) min,max
    out = pl.pallas_call(
        _minmax_apply_kernel,
        out_shape=jax.ShapeDtypeStruct((b, rows, _LANES), jnp.float32),
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
