"""3D max pooling with a scatter-free custom VJP.

XLA derives max-pool gradients via ``SelectAndScatter``, which lowers to a
serialized window scan on TPU — profiled at ~18 ms/step (~6%) of the
ResNet-18 3D train step for the stem's 3^3/s2 pool alone (CLAUDE.md perf
notes). The forward here stays ``lax.reduce_window`` (already optimal);
only the backward is replaced: for each of the window offsets (ascending
row-major order), compare the strided input slice against the pooled
output and credit the incoming gradient to the *first* position that
equals the max ("first-wins", bitwise-exact in any dtype since the max is
one of the compared values). Each offset's contribution returns to input
coordinates via ``lax.pad`` with interior dilation — everything is
elementwise/pad/slice, which XLA fuses, and no scatter is emitted.

Tie semantics match XLA's ``SelectAndScatter`` exactly (first matching
element in ascending window order — verified empirically on both CPU and
TPU backends, and locked in by tests/test_maxpool_vjp.py with tie-heavy
relu-zero inputs). Matches torch's single-winner maxpool gradient.

MEASURED DEAD END as an XLA-level rewrite (v5e, ResNet-18 stem, batch
128): 85 ms fwd+bwd vs SelectAndScatter's 57 ms isolated; 282 vs 322
vol/s end-to-end. XLA materializes the 27-step claim chain and the parity
interleave (trace: 2x6.5 ms copies + 6.3 ms pad + selects) instead of
fusing them. A naive per-offset ``lax.pad`` accumulation is worse still —
it OOM'd (27 live input-sized intermediates, 53 GB). The formulation is
numerically exact (identical checksums) and kept as the reference
implementation for a future Pallas backward kernel, whose single-pass
traffic (~4.3 GB) would land near 6 ms; models default to XLA's lowering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _pool_forward(x, window, strides, padding):
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else \
        jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg_inf, lax.max,
        (1,) + tuple(window) + (1,),
        (1,) + tuple(strides) + (1,),
        ((0, 0),) + tuple(padding) + ((0, 0),))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool3d_sf(x, window, strides, padding):
    """Max pool over the three spatial dims of (B, D, H, W, C).

    Args:
      x: (B, D, H, W, C) array.
      window / strides: 3-tuples of ints.
      padding: 3-tuple of (lo, hi) pairs (torch-style explicit padding).
    """
    return _pool_forward(x, window, strides, padding)


def _fwd(x, window, strides, padding):
    y = _pool_forward(x, window, strides, padding)
    return y, (x, y)


def _space_to_depth(x, window, strides, padding):
    """Space-to-depth the padded input so every window offset's strided
    slice becomes a contiguous slice of one stride-parity plane.

    Returns (xs, j_max, neg_inf): xs[b, j, p_idx, c] = x_pad[b, s*j + p, c]
    with p_idx = (p_d * s_h + p_h) * s_w + p_w.
    """
    spatial = x.shape[1:4]
    batch, channels = x.shape[0], x.shape[-1]
    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else \
        jnp.iinfo(x.dtype).min
    padded = tuple(spatial[i] + padding[i][0] + padding[i][1]
                   for i in range(3))
    j_max = tuple(-(-padded[i] // strides[i]) for i in range(3))
    x_pad = jnp.pad(
        x,
        ((0, 0),) + tuple(
            (padding[i][0],
             padding[i][1] + j_max[i] * strides[i] - padded[i])
            for i in range(3)) + ((0, 0),),
        constant_values=neg_inf)
    xs = x_pad.reshape(
        batch, j_max[0], strides[0], j_max[1], strides[1], j_max[2],
        strides[2], channels)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        (batch,) + j_max + (strides[0] * strides[1] * strides[2],
                            channels))
    return xs, j_max, neg_inf


def _offset_slice(xs, o, window, strides, out_spatial):
    """Strided window slice for offset o as a contiguous xs slice."""
    batch, channels = xs.shape[0], xs.shape[-1]
    p = tuple(o[i] % strides[i] for i in range(3))
    k = tuple((o[i] - p[i]) // strides[i] for i in range(3))
    p_idx = (p[0] * strides[1] + p[1]) * strides[2] + p[2]
    j_max = xs.shape[1:4]
    # clip to the subgrid length: positions past j_max never exist
    w_hi = tuple(min(out_spatial[i], j_max[i] - k[i]) for i in range(3))
    s = lax.slice(
        xs,
        (0, k[0], k[1], k[2], p_idx, 0),
        (batch, k[0] + w_hi[0], k[1] + w_hi[1], k[2] + w_hi[2],
         p_idx + 1, channels))[..., 0, :]
    return s, p, k, w_hi


def _bwd_winner(window, strides, padding, residuals, g):
    """Chain-free gradient assembly via a winner-offset map.

    The claim-chain backward (``_bwd`` below) serializes 27 output-sized
    ``already`` updates, which XLA materializes (measured 85 ms isolated).
    This variant removes the chain: pass 1 computes, per output window, the
    row-major-first offset attaining the max —

        winner = min over offsets o of where(slice_o == y, lin(o), N_OFF)

    an associative elementwise min-tree over independent comparisons that
    XLA fuses into a single pass over the space-to-depth'd input. Tie
    semantics are identical to SelectAndScatter/claim-chain by
    construction: the smallest linear offset equal to the max wins. Pass 2
    credits g where ``winner == lin(o)`` — 27 *independent* masked copies
    accumulated into the s^3 stride-parity buffers (one input-sized buffer
    total) and interleaved back, as in ``_bwd``.
    """
    x, y = residuals
    spatial = x.shape[1:4]
    out_spatial = y.shape[1:4]
    batch, channels = x.shape[0], x.shape[-1]

    xs, j_max, _ = _space_to_depth(x, window, strides, padding)

    offsets = [(od, oh, ow)
               for od in range(window[0])
               for oh in range(window[1])
               for ow in range(window[2])]
    n_off = len(offsets)

    # Pass 1: winner-offset map (int32 on-lane compares; fused by XLA).
    winner = jnp.full(y.shape, n_off, jnp.int32)
    for lin, o in enumerate(offsets):
        s, _, k, w_hi = _offset_slice(xs, o, window, strides, out_spatial)
        if w_hi != out_spatial:  # overhang: slice shorter than y; pad taps
            s = jnp.pad(s, ((0, 0),) + tuple(
                (0, out_spatial[i] - w_hi[i]) for i in range(3))
                + ((0, 0),), constant_values=-jnp.inf
                if jnp.issubdtype(s.dtype, jnp.floating)
                else jnp.iinfo(s.dtype).min)
        winner = jnp.minimum(winner, jnp.where(s == y, lin, n_off))

    # Pass 2: independent per-offset credits into parity buffers.
    zero = jnp.zeros((), g.dtype)
    n_par = strides[0] * strides[1] * strides[2]
    parity_acc = [None] * n_par
    for lin, o in enumerate(offsets):
        p = tuple(o[i] % strides[i] for i in range(3))
        k = tuple((o[i] - p[i]) // strides[i] for i in range(3))
        contrib = jnp.where(winner == lin, g, jnp.zeros_like(g))
        w_hi = tuple(min(out_spatial[i], j_max[i] - k[i]) for i in range(3))
        piece = lax.slice(contrib, (0, 0, 0, 0, 0),
                          (batch,) + w_hi + (channels,))
        cfg = ((0, 0, 0),) + tuple(
            (k[i], j_max[i] - k[i] - w_hi[i], 0)
            for i in range(3)) + ((0, 0, 0),)
        piece = lax.pad(piece, zero, cfg)
        idx = (p[0] * strides[1] + p[1]) * strides[2] + p[2]
        parity_acc[idx] = piece if parity_acc[idx] is None \
            else parity_acc[idx] + piece

    for i, acc in enumerate(parity_acc):
        if acc is None:
            parity_acc[i] = jnp.zeros(
                (batch,) + j_max + (channels,), g.dtype)

    stacked = jnp.stack(parity_acc, axis=-2)
    stacked = stacked.reshape(
        (batch,) + j_max + tuple(strides) + (channels,))
    dx_pad = stacked.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        batch, j_max[0] * strides[0], j_max[1] * strides[1],
        j_max[2] * strides[2], channels)
    dx = lax.slice(
        dx_pad,
        (0, padding[0][0], padding[1][0], padding[2][0], 0),
        (batch, padding[0][0] + spatial[0], padding[1][0] + spatial[1],
         padding[2][0] + spatial[2], channels))
    return (dx.astype(x.dtype),)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def max_pool3d_wf(x, window, strides, padding):
    """Max pool with the chain-free winner-offset backward (``_bwd_winner``).

    Same forward and tie semantics as ``max_pool3d_sf``; the backward
    replaces the serialized claim chain with a fusable min-tree.

    MEASURED DEAD END as an XLA-level rewrite, like the claim chain (v5e,
    ResNet-18 train step, batch 128, end-to-end): 293 vol/s vs
    SelectAndScatter's 321 (claim chain: 282). Removing the serialization
    recovered ~a third of the gap but XLA still materializes the
    space-to-depth'd input and the 27 masked-credit buffers instead of
    fusing the passes. Conclusion stands: only a hand Pallas backward
    (single pass over the input) can beat XLA's SelectAndScatter here.
    """
    return _pool_forward(x, window, strides, padding)


max_pool3d_wf.defvjp(_fwd, _bwd_winner)


def _bwd(window, strides, padding, residuals, g):
    """Parity-decomposed gradient assembly.

    Padded-input position i = s*w + o, so offset o only ever touches the
    stride-parity subgrid p = o mod s, at subgrid index j = w + (o - p)/s.
    Contributions therefore accumulate into s^3 window-grid-sized parity
    buffers (total = one input-sized buffer) and a single space-to-depth
    interleave assembles dx — no scatter, no full-size buffer per offset
    (a naive per-offset lax.pad accumulation OOM'd at batch 128: 27 live
    input-sized intermediates).
    """
    x, y = residuals
    spatial = x.shape[1:4]
    out_spatial = y.shape[1:4]
    batch, channels = x.shape[0], x.shape[-1]

    neg_inf = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else \
        jnp.iinfo(x.dtype).min
    # per-dim subgrid length, rounded up so every parity has equal length
    padded = tuple(spatial[i] + padding[i][0] + padding[i][1]
                   for i in range(3))
    j_max = tuple(-(-padded[i] // strides[i]) for i in range(3))

    # Space-to-depth the padded input ONCE (pad high side so every dim is
    # stride-divisible): xs[b, j, p, c] = x_pad[b, s*j + p, c]. Every
    # offset's strided window slice then becomes a contiguous slice of one
    # parity plane — 27 strided gathers of the full input collapse into
    # one transpose.
    x_pad = jnp.pad(
        x,
        ((0, 0),) + tuple(
            (padding[i][0],
             padding[i][1] + j_max[i] * strides[i] - padded[i])
            for i in range(3)) + ((0, 0),),
        constant_values=neg_inf)
    xs = x_pad.reshape(
        batch, j_max[0], strides[0], j_max[1], strides[1], j_max[2],
        strides[2], channels)
    xs = xs.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        (batch,) + j_max + (strides[0] * strides[1] * strides[2],
                            channels))

    zero = jnp.zeros((), g.dtype)
    n_par = strides[0] * strides[1] * strides[2]
    parity_acc = [None] * n_par

    already = jnp.zeros(y.shape, jnp.bool_)
    for od in range(window[0]):
        for oh in range(window[1]):
            for ow in range(window[2]):
                o = (od, oh, ow)
                p = tuple(o[i] % strides[i] for i in range(3))
                k = tuple((o[i] - p[i]) // strides[i] for i in range(3))
                p_idx = (p[0] * strides[1] + p[1]) * strides[2] + p[2]
                # x_pad[s*w + o] == xs[w + k, parity p]
                s = lax.slice(
                    xs,
                    (0, k[0], k[1], k[2], p_idx, 0),
                    (batch, k[0] + out_spatial[0], k[1] + out_spatial[1],
                     k[2] + out_spatial[2], p_idx + 1, channels))[..., 0, :]
                claimed = (s == y) & ~already
                already = already | claimed
                contrib = jnp.where(claimed, g, jnp.zeros_like(g))

                # place contrib[w] at subgrid index j = w + k, clipped to
                # [0, j_max): slice the overhang, zero-pad the rest
                w_hi = tuple(min(out_spatial[i], j_max[i] - k[i])
                             for i in range(3))
                piece = lax.slice(
                    contrib, (0, 0, 0, 0, 0),
                    (batch,) + w_hi + (channels,))
                cfg = ((0, 0, 0),) + tuple(
                    (k[i], j_max[i] - k[i] - w_hi[i], 0)
                    for i in range(3)) + ((0, 0, 0),)
                piece = lax.pad(piece, zero, cfg)
                idx = (p[0] * strides[1] + p[1]) * strides[2] + p[2]
                parity_acc[idx] = piece if parity_acc[idx] is None \
                    else parity_acc[idx] + piece

    for i, acc in enumerate(parity_acc):
        if acc is None:  # parity untouched (window smaller than stride)
            parity_acc[i] = jnp.zeros(
                (batch,) + j_max + (channels,), g.dtype)

    # interleave: dx_pad[b, s*j + p, ...] = parity_acc[p][b, j, ...]
    stacked = jnp.stack(parity_acc, axis=-2)  # (B, Jd, Jh, Jw, P, C)
    stacked = stacked.reshape(
        (batch,) + j_max + tuple(strides) + (channels,))
    dx_pad = stacked.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
        batch, j_max[0] * strides[0], j_max[1] * strides[1],
        j_max[2] * strides[2], channels)

    dx = lax.slice(
        dx_pad,
        (0, padding[0][0], padding[1][0], padding[2][0], 0),
        (batch, padding[0][0] + spatial[0], padding[1][0] + spatial[1],
         padding[2][0] + spatial[2], channels))
    return (dx.astype(x.dtype),)


max_pool3d_sf.defvjp(_fwd, _bwd)


def max_pool3d(x, window=2, stride=None, padding=0):
    """Convenience wrapper: ints or 3-tuples, torch-style padding int."""
    if isinstance(window, int):
        window = (window,) * 3
    if stride is None:
        stride = window
    if isinstance(stride, int):
        stride = (stride,) * 3
    if isinstance(padding, int):
        padding = ((padding, padding),) * 3
    return max_pool3d_sf(x, tuple(window), tuple(stride), tuple(padding))
