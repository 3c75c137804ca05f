"""Pallas TPU backward kernel for the stem max pool — CLOSED, kept as reference.

VERDICT round 1 named a hand Pallas maxpool backward as "the only way to
beat SelectAndScatter". This module is that kernel: a single-pass
winner-offset backward with SelectAndScatter's exact tie semantics and
per-element accumulation order, bitwise-equal gradients in every dtype
(tests/test_pallas_maxpool.py, Pallas interpreter). The conclusion from
building it, however, is a MEASURED NEGATIVE: on this toolchain the
compiled kernel cannot beat XLA's SelectAndScatter, and the item is closed.

The budget (v5e, ResNet-18 flagship, batch 128, e2e): replacing the stem
pool with a shape-identical strided slice lifts training from 321.4 to
only 335.5 vol/s — the ENTIRE pool (forward + backward) costs ~16.7 ms of
a ~398 ms step. The kernel's floor is higher:

  * ~5.3 ms roofline traffic (x+y+g read, dx write ~4.3 GB @ 819 GB/s);
  * Mosaic requires DMA slices to be tile-aligned in the last two dims,
    so the halo slab cannot be DMA'd from the (..., 46, 64) activation —
    halo delivery must go through extra auto-blocked in_specs, re-fetching
    +75% of x at a VMEM-viable block size;
  * Mosaic cannot express the final H/W parity re-interleave in-VMEM for
    these shapes (strided stores and jnp.repeat crash the compile helper;
    stack+merge reshape hits "unsupported shape cast"; tpu.roll is 32-bit
    only), so the quarters must be recombined by XLA outside — one extra
    dx-sized HBM round trip, ~4.6 ms;
  * the forward (lax.reduce_window, ~2.6 ms) is unchanged.

Floor ≈ 5.3 + ~2 + 4.6 + 2.6 ≈ 15 ms vs SelectAndScatter's 16.7 ms for
fwd+bwd: no meaningful headroom, high complexity. The XLA-level rewrites
measured earlier (ops/maxpool.py: claim-chain 282 vol/s, winner-offset
293 vol/s vs 321) lose for the same structural reason — the interleave/
scatter step always costs a materialized pass somewhere.

Mosaic findings recorded for future kernels on this toolchain:
  * DMA (memref_slice) extents must be tile-aligned in the (sublane,
    lane) dims — full-but-unaligned logical dims (46, 64) are rejected;
  * strided slices lower to >2D gathers ("Only 2D gather is supported")
    for most shapes/dtypes — parity-decompose via reshape + unit-index;
  * masks may not cross bitwidths (i1 from an int32 compare cannot drive
    a bf16 select) — keep compares in the data dtype;
  * tpu.iota is integer-only; tpu.dynamic_rotate is 32-bit only (roll
    bf16 via an exact f32 round trip).

The kernel below stays as the parity-proven reference implementation
(interpret=True): exact forward, exact gradients, any shape (odd W via an
outside -inf pad). The compiled path still hits the DMA alignment wall by
design — revisit only if Mosaic gains unaligned DMA or in-register
sublane interleave.

Reference behavior: the stem pool of the MedicalNet 3D ResNet backbone
(reference pkg/models/mri_models/anat_cnn.py, Med3D
``nn.MaxPool3d(kernel_size=3, stride=2, padding=1)``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_alzheimer_tpu.ops.maxpool import _pool_forward

WINDOW = (3, 3, 3)
STRIDES = (2, 2, 2)
PADDING = ((1, 1), (1, 1), (1, 1))
BI = 4  # input D-planes per program (even; slab = BI + 4 with halo)


def _neg_inf(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(-jnp.inf, dtype)
    return jnp.array(jnp.iinfo(dtype).min, dtype)


def _q_len(n: int, parity: int) -> int:
    """Number of indices < n with the given parity."""
    return (n - parity + 1) // 2


def _hw_slices(n_out_dim, n_in_dim, off):
    """Target mapping for one spatial dim and window offset ``off``.

    Output index o (0..n_out_dim-1) credits input index 2o + off - 1.
    Returns (parity, src_slice, n_valid): contrib[src] lands at quarter
    indices [0:n_valid] of parity plane ``parity``.
    """
    if off == 1:            # input 2o: even parity, all windows valid
        return 0, slice(0, _q_len(n_in_dim, 0)), _q_len(n_in_dim, 0)
    if off == 0:            # input 2o-1: odd parity, o=0 falls off the edge
        return 1, slice(1, n_out_dim), n_out_dim - 1
    n = min(n_out_dim, _q_len(n_in_dim, 1))  # off==2: input 2o+1 < n_in
    return 1, slice(0, n), n


def _bwd_kernel(x_ref, y_ref, g_ref, acc0, acc1, acc2, acc3,
                xpad, ysl, gsl, sems,
                *, D, H, W, C, Do, Ho, Wo):
    b = pl.program_id(0)
    k = pl.program_id(1)
    i0 = k * BI
    dlo = i0 // 2  # first contributing output plane (i0 is even)
    n_out = BI // 2 + 1
    neg = _neg_inf(x_ref.dtype)

    # ---- DMA in: x slab (plane-wise, -inf borders), y/g slabs ----
    # DMA slices must be tile-aligned in the last two (sublane, lane)
    # dims, so each plane lands at full W/C extent; the H border offset is
    # fine (H is untiled) and the W borders are handled with roll+mask in
    # compute (below) instead of padded placement.
    xpad[...] = jnp.full(xpad.shape, neg, x_ref.dtype)

    def x_dma(r, p):
        return pltpu.make_async_copy(
            x_ref.at[b, pl.ds(p, 1)],
            xpad.at[pl.ds(r, 1), pl.ds(1, H)],
            sems.at[r])

    def y_dma(jj, d):
        return pltpu.make_async_copy(y_ref.at[b, pl.ds(d, 1)],
                                     ysl.at[pl.ds(jj, 1)],
                                     sems.at[BI + 4 + jj])

    def g_dma(jj, d):
        return pltpu.make_async_copy(g_ref.at[b, pl.ds(d, 1)],
                                     gsl.at[pl.ds(jj, 1)],
                                     sems.at[BI + 4 + n_out + jj])

    for r in range(BI + 4):
        p = i0 - 2 + r

        @pl.when((p >= 0) & (p < D))
        def _(r=r, p=p):
            x_dma(r, p).start()
    for jj in range(n_out):
        d = dlo + jj

        @pl.when(d < Do)
        def _(jj=jj, d=d):
            y_dma(jj, d).start()
            g_dma(jj, d).start()

    for r in range(BI + 4):
        p = i0 - 2 + r

        @pl.when((p >= 0) & (p < D))
        def _(r=r, p=p):
            x_dma(r, p).wait()
    for jj in range(n_out):
        d = dlo + jj

        @pl.when(d < Do)
        def _(jj=jj, d=d):
            y_dma(jj, d).wait()
            g_dma(jj, d).wait()

    # ---- H/W parity split (reshape + unit-index; no strided slices) ----
    S, Hp, _, _ = xpad.shape
    Wc = W // 2  # W even on the compiled path (asserted by the caller)
    xs = xpad[...]
    xw = [xs.reshape(S, Hp, Wc, 2, C)[:, :, :, pw, :] for pw in (0, 1)]
    xq = {(ph, pw): xw[pw].reshape(S, Hp // 2, 2, Wc, C)[:, :, ph, :, :]
          for ph in (0, 1) for pw in (0, 1)}
    # W is NOT padded in the slab (DMA alignment), so the W coordinate is
    # the raw 2*out + ow - 1: ow=1 -> even plane, ow=2 -> odd plane, and
    # ow=0 -> odd plane shifted right by one with -inf entering at column
    # 0 (the left pad). The shift mask uses a same-dtype iota — a
    # cross-bitwidth mask trips an unsupported Mosaic relayout.
    # Mosaic's rotate handles 32-bit data only, so the shift runs in f32
    # (exact for bf16) and converts back; iota must be integer on TPU and
    # int32 matches the f32 bitwidth (masks may not cross bitwidths).
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Wc, 1), 2)
    colmask = col == 0
    neg32 = jnp.asarray(-jnp.inf if jnp.issubdtype(xs.dtype, jnp.floating)
                        else jnp.iinfo(xs.dtype).min, jnp.float32)
    xq_shift = {ph: jnp.where(colmask, neg32,
                              pltpu.roll(xq[(ph, 1)].astype(jnp.float32),
                                         1, 2)).astype(xs.dtype)
                for ph in (0, 1)}

    def off_slice(j, od, oh, ow):
        """Aligned slice for window offset (od, oh, ow) at output plane j.

        H coordinate = 2*out + oh (the slab carries the H pad); W uses
        the unpadded coordinate 2*out + ow - 1 via the parity planes.
        """
        plane = 2 * j + od + 1  # slab D index (static)
        hs = oh // 2
        if ow == 0:
            src = xq_shift[oh % 2]
        else:
            src = xq[(oh % 2, ow - 1)]
        return src[plane, hs:hs + Ho, 0:Wo, :]

    # The output blocks double as the accumulators. Fully overwrite them:
    # pipelined blocks carry stale data from previous programs.
    accs = {(0, 0): acc0, (0, 1): acc1, (1, 0): acc2, (1, 1): acc3}
    for a in accs.values():
        a[...] = jnp.zeros(a.shape, gsl.dtype)

    for j in range(n_out):
        d_ok = dlo + j < Do
        y_j = ysl[j]
        g_j = gsl[j]

        # pass 1: winner-offset map (27-way fusable min-tree). The map is
        # kept in the data dtype (offsets 0..27 are exact in bf16): a
        # cross-bitwidth mask (i1 from an int32 compare applied to bf16
        # data) trips an unsupported Mosaic mask relayout.
        wdt = gsl.dtype
        winner = jnp.full((Ho, Wo, C), 27, wdt)
        for od in range(3):
            for oh in range(3):
                for ow in range(3):
                    lin = od * 9 + oh * 3 + ow
                    s = off_slice(j, od, oh, ow)
                    winner = jnp.minimum(
                        winner, jnp.where(s == y_j,
                                          jnp.asarray(lin, wdt),
                                          jnp.asarray(27, wdt)))

        # pass 2: credits, in SelectAndScatter's per-element add order
        # (ascending window index = offsets enumerated 2, 1, 0 per dim;
        # ascending output plane comes from the j loop).
        for od in (2, 1, 0):
            r = 2 * j + od - 1  # target input plane, program-relative
            if not (0 <= r < BI):
                continue        # owned by a neighboring program
            for oh in (2, 1, 0):
                ph, src_h, nh = _hw_slices(Ho, H, oh)
                for ow in (2, 1, 0):
                    pw, src_w, nw = _hw_slices(Wo, W, ow)
                    lin = od * 9 + oh * 3 + ow

                    @pl.when(d_ok)
                    def _(r=r, ph=ph, pw=pw, src_h=src_h, src_w=src_w,
                          nh=nh, nw=nw, lin=lin):
                        contrib = jnp.where(
                            winner == jnp.asarray(lin, winner.dtype), g_j,
                            jnp.zeros_like(g_j))
                        piece = contrib[src_h, src_w, :][0:nh, 0:nw, :]
                        q = accs[(ph, pw)]
                        q[0, r, 0:nh, 0:nw, :] = (
                            q[0, r, 0:nh, 0:nw, :] + piece)


def _bwd_pallas(x, y, g, interpret):
    B, D, H, W, C = x.shape
    if W % 2:
        # The kernel's W-parity reshape needs even W; pad with -inf (never
        # a winner) and drop the extra column of dx. The flagship stem
        # width is even, so this costs nothing on the hot path.
        xp = jnp.pad(x, ((0, 0),) * 3 + ((0, 1), (0, 0)),
                     constant_values=_neg_inf(x.dtype))
        return _bwd_pallas(xp, y, g, interpret)[:, :, :, 0:W, :]
    Do, Ho, Wo = y.shape[1:4]
    n_out = BI // 2 + 1
    Hp = H + 2 + ((H + 2) % 2)  # even so the parity planes split cleanly
    hh = _q_len(H, 0)           # == Ho; quarter H capacity
    wh = _q_len(W, 0)           # == Wo

    Dq = pl.cdiv(D, BI) * BI    # D padded to the block grid
    kernel = partial(_bwd_kernel, D=D, H=H, W=W, C=C, Do=Do, Ho=Ho, Wo=Wo)
    qspec = pl.BlockSpec((1, BI, hh, wh, C), lambda b, k: (b, k, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    qshape = jax.ShapeDtypeStruct((B, Dq, hh, wh, C), g.dtype)
    quarters = pl.pallas_call(
        kernel,
        grid=(B, pl.cdiv(D, BI)),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),  # y
            pl.BlockSpec(memory_space=pltpu.HBM),  # g
        ],
        out_specs=(qspec,) * 4,
        out_shape=(qshape,) * 4,
        scratch_shapes=[
            pltpu.VMEM((BI + 4, Hp, W, C), x.dtype),      # xpad
            pltpu.VMEM((n_out, Ho, Wo, C), y.dtype),       # y slab
            pltpu.VMEM((n_out, Ho, Wo, C), g.dtype),       # g slab
            pltpu.SemaphoreType.DMA((BI + 4 + 2 * n_out,)),
        ],
        interpret=interpret,
    )(x, y, g)

    # XLA-side H/W re-interleave (one fused stack+reshape pass; Mosaic
    # cannot express the sublane interleave in-kernel — see module doc).
    q00, q01, q10, q11 = quarters
    t0 = jnp.stack([q00, q01], axis=4)           # (B, Dq, hh, wh, 2, C)
    t1 = jnp.stack([q10, q11], axis=4)
    t = jnp.stack([t0, t1], axis=3)              # (B, Dq, hh, 2, wh, 2, C)
    dx = t.reshape(B, Dq, 2 * hh, 2 * wh, C)[:, 0:D, 0:H, 0:W, :]
    return dx.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool3d_pl(x, interpret=False):
    """Stem max pool (3^3, stride 2, pad 1) with the Pallas backward.

    Forward is XLA's ``lax.reduce_window`` (already optimal); only the
    gradient uses the hand kernel. ``interpret=True`` runs the kernel in
    the Pallas interpreter (for CPU tests).
    """
    return _pool_forward(x, WINDOW, STRIDES, PADDING)


def _fwd(x, interpret):
    y = _pool_forward(x, WINDOW, STRIDES, PADDING)
    return y, (x, y)


def _bwd(interpret, residuals, g):
    x, y = residuals
    return (_bwd_pallas(x, y, g.astype(x.dtype), interpret),)


max_pool3d_pl.defvjp(_fwd, _bwd)
