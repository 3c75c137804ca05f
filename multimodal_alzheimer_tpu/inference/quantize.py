"""Post-training int8 quantization for the serving path.

The v5e MXU executes int8 x int8 -> int32 at 394 TOPS — 2x its bf16 peak
— and the bf16 serving step already runs at ~0.77 forward MFU (README),
so int8 is the only surface with a 2x ceiling left. The reference has no
quantization story at all (fp32 PyTorch eval); this module gives the
TPU-native deployment one:

  * **BN folding**: in eval mode BatchNorm is an affine map, so every
    conv+BN pair collapses into one conv with per-channel folded weights
    and a bias (`fold_backbone`) — algebraically exact.
  * **Symmetric PTQ**: per-output-channel int8 weights, per-tensor int8
    activations with scales from a one-pass absmax calibration
    (`calibrate_backbone` — runs the *folded f32* graph, which is
    numerically identical to the float model, so calibration needs no
    extra machinery).
  * **int8 dataflow**: activations stay int8 across block boundaries
    (conv epilogues fuse the int32->f32 rescale + bias + ReLU + requant,
    so HBM carries 1/4 the bytes of the bf16 path); the stem maxpool
    runs directly on int8 (max commutes with the monotone requant —
    exact). Residual adds happen in f32 inside the fused epilogue.
  * Spatial zero-padding is exact under symmetric quantization (zero
    point is 0), and the int32 accumulator cannot overflow: the largest
    contraction here is 27 taps x 512 ch x 127^2 < 2^31.

Only the backbone is quantized — it is >99% of inference FLOPs (the
flagship head is GAP + Dense(3), BASELINE.md's budget) — and the head
runs in f32 on the dequantized feature map, preserving the
`backbone_gap` embedding tap contract.

Scope: every Med3D depth — basic blocks (10/18/34) and depth-50
bottlenecks — both dilated (Med3D parity) and strided layouts, s2d or
plain stem. The largest contraction (bottleneck conv2: 27 taps x 512
ch) still keeps the int32 accumulator safe.

Reference: no counterpart (pkg/ has no inference optimization layer);
serving parity surface is inference/predictor.py's output contract.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from multimodal_alzheimer_tpu.models.resnet3d import BLOCK_CONFIGS

_DIMS = ("NDHWC", "DHWIO", "NDHWC")
_EPS = 1e-5


# --------------------------------------------------------------------------
# BN folding
# --------------------------------------------------------------------------

def _fold_pair(conv_p: dict, bn_p: dict, bn_s: dict, eps: float = _EPS):
    """conv -> BN(eval) == conv(folded kernel) + bias. Exact algebra."""
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    return {"w": conv_p["kernel"] * g, "bias": bn_p["bias"] - bn_s["mean"] * g}


def fold_backbone(variables: dict, depth: int = 18) -> dict:
    """Fold every conv+BN pair of a MedicalNetResNet3D into conv+bias.

    Args:
      variables: AnatCNN-style {'params', 'batch_stats'} containing a
        'backbone' subtree, or the backbone collections directly.
    Returns:
      {'conv1': {w, bias}, 'layer{i}_block{j}': {'conv1': .., 'conv2': ..,
       ['downsample': ..]}} with f32 folded kernels in canonical layout.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    if "backbone" in params:
        params, stats = params["backbone"], stats["backbone"]
    kind, layout = BLOCK_CONFIGS[depth]

    folded = {"conv1": _fold_pair(params["conv1"], params["bn1"],
                                  stats["bn1"])}
    for li in range(1, 5):
        for bi in range(layout[li - 1]):
            name = f"layer{li}_block{bi}"
            p, s = params[name], stats[name]
            blk = {
                "conv1": _fold_pair(p["conv1"], p["bn1"], s["bn1"]),
                "conv2": _fold_pair(p["conv2"], p["bn2"], s["bn2"]),
            }
            if kind == "bottleneck":
                blk["conv3"] = _fold_pair(p["conv3"], p["bn3"], s["bn3"])
            if "downsample_conv" in p:
                blk["downsample"] = _fold_pair(
                    p["downsample_conv"], p["downsample_bn"],
                    s["downsample_bn"])
            folded[name] = blk
    return folded


# --------------------------------------------------------------------------
# Shared graph traversal (calibrate = folded f32; serve = int8)
# --------------------------------------------------------------------------

def _layer_specs(dilated: bool):
    if dilated:  # Med3D: layers 3-4 stride 1, dilation 2/4 (resnet3d.py)
        return [(64, 1, 1), (128, 2, 1), (256, 1, 2), (512, 1, 4)]
    return [(64, 1, 1), (128, 2, 1), (256, 2, 1), (512, 2, 1)]


def _torch_pad(k: int, dilation: int):
    p = dilation * (k - 1) // 2
    return [(p, p)] * 3


def _conv_f32(entry, x, stride, dilation, pad=None):
    if pad is None:
        pad = _torch_pad(entry["w"].shape[0], dilation)
    out = lax.conv_general_dilated(
        x, entry["w"], (stride,) * 3, pad,
        rhs_dilation=(dilation,) * 3, dimension_numbers=_DIMS)
    return out + entry["bias"]


def _conv_int8(entry, q, stride, dilation, pad=None):
    """int8 conv -> int32 -> fused f32 rescale (+bias). ``entry['scale']``
    already includes the input activation scale (static after calib)."""
    if pad is None:
        pad = _torch_pad(entry["wq"].shape[0], dilation)
    out = lax.conv_general_dilated(
        q, entry["wq"], (stride,) * 3, pad,
        rhs_dilation=(dilation,) * 3, dimension_numbers=_DIMS,
        preferred_element_type=jnp.int32)
    return out.astype(jnp.float32) * entry["scale"] + entry["bias"]


def _s2d_input(x):
    """2x2x2 space-to-depth of a 1-channel volume, torch pad-3 stem layout
    (mirrors models/resnet3d.py:SpaceToDepthStem — exact).

    Layout verdicts (int8 serve, batch 128, BASELINE.md budget): this
    pad/reshape/transpose chain costs ~2.2 ms of materialized int8
    relayout passes — and both measured alternatives LOSE: 8 parity
    strided-slices + stack lowers to 8 gather fusions at 1.7 ms each
    (strided slices become gathers on this toolchain), and skipping s2d
    for a plain stride-2 7^3 int8 conv costs 28.6 ms vs 10.1 for the
    whole stem (XLA's C_in=1 strided int8 emitter is as weak as the bf16
    one). A Pallas fuse of requant+interleave hits Mosaic's sublane-
    interleave limitation (see ops/pallas_maxpool.py). Closed at ~2 ms
    of theoretical headroom."""
    b = x.shape[0]
    dims = x.shape[1:4]
    pads = [(3, 3 + ((d + 6) % 2)) for d in dims]
    xp = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
    d2, h2, w2 = xp.shape[1] // 2, xp.shape[2] // 2, xp.shape[3] // 2
    xs = xp.reshape(b, d2, 2, h2, 2, w2, 2)
    return xs.transpose(0, 1, 3, 5, 2, 4, 6).reshape(b, d2, h2, w2, 8)


def _s2d_kernel(w):
    """(7,7,7,1,F) canonical kernel -> (4,4,4,8,F) s2d layout (exact)."""
    f = w.shape[-1]
    w8 = jnp.pad(w, ((0, 1), (0, 1), (0, 1), (0, 0), (0, 0)))
    w8 = w8.reshape(4, 2, 4, 2, 4, 2, 1, f)
    return w8.transpose(0, 2, 4, 1, 3, 5, 6, 7).reshape(4, 4, 4, 8, f)


def _max_pool_int8(q):
    """MaxPool3d(k=3, s=2, p=1) on int8. Identity -128 reproduces the
    -inf padding semantics of the f32 stem pool; max commutes with the
    monotone requant, so pooling the quantized tensor is exact."""
    return lax.reduce_window(
        q, jnp.int8(-128), lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])


def _max_pool_f32(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 3, 1), (1, 2, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])


class _CalibCtx:
    """Folded-f32 pass that records per-site activation absmax."""

    def __init__(self):
        self.absmax: Dict[str, jnp.ndarray] = {}

    def requant(self, site, x):
        self.absmax[site] = jnp.max(jnp.abs(x))
        return x

    conv = staticmethod(_conv_f32)
    pool = staticmethod(_max_pool_f32)


class _Int8Ctx:
    """int8 pass: ``scales[site]`` are static post-calibration floats."""

    def __init__(self, scales: Dict[str, float]):
        self.scales = scales

    def requant(self, site, x):
        s = self.scales[site]
        return jnp.clip(jnp.round(x * (1.0 / s)), -127, 127).astype(jnp.int8)

    conv = staticmethod(_conv_int8)
    pool = staticmethod(_max_pool_int8)


def _backbone_forward(tree, x, ctx, *, depth, dilated, stem_s2d):
    """One graph for both modes. ``tree`` holds whichever arrays the
    ctx's conv expects; requant sites are named identically so the
    calibration dict keys line up with the serve-time scale keys.

    The s2d stem: the space-to-depth rearrangement is pad-with-exact-
    zeros + reshape, so it commutes with symmetric quantization — it is
    applied to the already-quantized input; the kernel was transformed
    to the (4,4,4,8,F) layout before weight quantization. In calib mode
    the same s2d graph runs in f32 (numerically identical to the plain
    7^3 stride-2 conv, tests/test_s2d_stem.py).
    """
    kind, layout = BLOCK_CONFIGS[depth]

    with jax.named_scope("stem"):
        x = ctx.requant("stem_in", x)
        stem = tree["conv1"]
        if stem_s2d:
            y = ctx.conv(stem, _s2d_input(x), 1, 1, pad="VALID")
        else:
            y = ctx.conv(stem, x, 2, 1)
        y = jax.nn.relu(y)
    with jax.named_scope("maxpool"):
        carrier = ctx.pool(ctx.requant("pool_in", y))
    carrier_site = "pool_in"

    for li, (planes, stride, dilation) in enumerate(_layer_specs(dilated),
                                                    start=1):
        for bi in range(layout[li - 1]):
            name = f"layer{li}_block{bi}"
            blk = tree[name]
            st = stride if bi == 0 else 1
            with jax.named_scope(name):
                if kind == "basic":
                    h = jax.nn.relu(ctx.conv(blk["conv1"], carrier, st,
                                             dilation))
                    h = ctx.requant(f"{name}/mid", h)
                    h = ctx.conv(blk["conv2"], h, 1, dilation)
                else:  # bottleneck: 1^3 -> 3^3(stride/dil) -> 1^3 (x4)
                    h = jax.nn.relu(ctx.conv(blk["conv1"], carrier, 1, 1))
                    h = ctx.requant(f"{name}/mid1", h)
                    h = jax.nn.relu(ctx.conv(blk["conv2"], h, st,
                                             dilation))
                    h = ctx.requant(f"{name}/mid2", h)
                    h = ctx.conv(blk["conv3"], h, 1, 1)
                if "downsample" in blk:
                    res = ctx.conv(blk["downsample"], carrier, st, 1)
                elif isinstance(ctx, _Int8Ctx):
                    res = (carrier.astype(jnp.float32)
                           * ctx.scales[carrier_site])
                else:
                    res = carrier
                y = jax.nn.relu(h + res)
            last = li == 4 and bi == layout[3] - 1
            if last:
                return y  # f32 fmap for the float head
            carrier_site = f"{name}/out"
            carrier = ctx.requant(carrier_site, y)
    raise AssertionError("unreachable")


def _with_s2d_stem(folded: dict) -> dict:
    """Copy of a folded tree with the stem kernel in the s2d layout."""
    out = dict(folded)
    out["conv1"] = {"w": _s2d_kernel(folded["conv1"]["w"]),
                    "bias": folded["conv1"]["bias"]}
    return out


# --------------------------------------------------------------------------
# Calibration + quantization
# --------------------------------------------------------------------------

def calibrate_backbone(folded: dict, batches, *, depth=18, dilated=True,
                       stem_s2d=True) -> Dict[str, float]:
    """absmax per requant site over ``batches`` (iterable of (B,D,H,W,1)
    f32 arrays, already preprocessed). Runs the folded-f32 graph — which
    equals the float model's eval forward — jitted once."""

    tree = _with_s2d_stem(folded) if stem_s2d else folded

    @jax.jit
    def one(x):
        ctx = _CalibCtx()
        _backbone_forward(tree, x, ctx, depth=depth, dilated=dilated,
                          stem_s2d=stem_s2d)
        return ctx.absmax

    agg: Dict[str, float] = {}
    for x in batches:
        out = jax.device_get(one(jnp.asarray(x)))
        for k, v in out.items():
            agg[k] = max(agg.get(k, 0.0), float(v))
    return agg


def _quantize_kernel(entry, in_scale: float):
    """Per-out-channel symmetric weights; fold the (static) input scale
    into the epilogue multiplier so serving math is one madd."""
    w = entry["w"]
    sw = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    sw = jnp.maximum(sw, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return {"wq": wq, "scale": (sw * in_scale).astype(jnp.float32),
            "bias": entry["bias"].astype(jnp.float32)}


def quantize_backbone(folded: dict, absmax: Dict[str, float], *,
                      depth=18, dilated=True, stem_s2d=True) -> dict:
    """Folded f32 tree + calibration absmax -> int8 serving tree."""
    kind, layout = BLOCK_CONFIGS[depth]
    scales = {k: max(v, 1e-12) / 127.0 for k, v in absmax.items()}

    stem = dict(folded["conv1"])
    if stem_s2d:
        stem = {"w": _s2d_kernel(stem["w"]), "bias": stem["bias"]}
    qtree = {"conv1": _quantize_kernel(stem, scales["stem_in"])}

    carrier_site = "pool_in"
    for li in range(1, 5):
        for bi in range(layout[li - 1]):
            name = f"layer{li}_block{bi}"
            blk = folded[name]
            q = {"conv1": _quantize_kernel(blk["conv1"],
                                           scales[carrier_site])}
            if kind == "basic":
                q["conv2"] = _quantize_kernel(blk["conv2"],
                                              scales[f"{name}/mid"])
            else:
                q["conv2"] = _quantize_kernel(blk["conv2"],
                                              scales[f"{name}/mid1"])
                q["conv3"] = _quantize_kernel(blk["conv3"],
                                              scales[f"{name}/mid2"])
            if "downsample" in blk:
                q["downsample"] = _quantize_kernel(blk["downsample"],
                                                   scales[carrier_site])
            qtree[name] = q
            if not (li == 4 and bi == layout[3] - 1):
                carrier_site = f"{name}/out"
    qtree["scales"] = scales
    qtree["config"] = {"depth": depth, "dilated": dilated,
                       "stem_s2d": stem_s2d}
    return qtree


def int8_backbone_apply(qtree: dict, x: jnp.ndarray) -> jnp.ndarray:
    """(B, D, H, W, 1) f32 -> (B, d, h, w, C) f32 feature map, int8 path."""
    cfg = qtree["config"]
    ctx = _Int8Ctx(qtree["scales"])
    return _backbone_forward(qtree, x, ctx, depth=cfg["depth"],
                             dilated=cfg["dilated"],
                             stem_s2d=cfg["stem_s2d"])


def folded_backbone_apply(folded: dict, x: jnp.ndarray, *, depth=18,
                          dilated=True, stem_s2d=True) -> jnp.ndarray:
    """Folded-f32 forward (the calibration graph) — equals the float
    model's eval forward; exported for parity tests."""
    tree = _with_s2d_stem(folded) if stem_s2d else folded
    ctx = _CalibCtx()
    return _backbone_forward(tree, x, ctx, depth=depth, dilated=dilated,
                             stem_s2d=stem_s2d)


# --------------------------------------------------------------------------
# Whole-model serving fn (AnatCNN: int8 backbone + f32 head)
# --------------------------------------------------------------------------

def _anat_head_and_vars(model, variables: dict):
    """Rebuild the f32 classifier head + its variables from an AnatCNN.

    One definition shared by the int8 and folded serve builders: the head
    is reconstructed from 9 model attributes, and constructing it in two
    places already bit us once (bn_torch_stats had to be threaded into
    both) — any new head hparam must flow through here.
    """
    from multimodal_alzheimer_tpu.models.heads import ClassifierHead3D

    head = ClassifierHead3D(
        n_classes=model.n_classes, conv_out=tuple(model.conv_out),
        filter_size=tuple(model.filter_size),
        linear_out=tuple(model.linear_out),
        batchnorm_begin=model.batchnorm_begin,
        batchnorm_conv=model.batchnorm_conv,
        batchnorm_dense=model.batchnorm_dense,
        trailing_relu=model.trailing_relu,
        bn_torch_stats=model.bn_torch_stats)
    head_vars = {"params": variables["params"]["head"]}
    stats = variables.get("batch_stats", {})
    if "head" in stats:
        head_vars["batch_stats"] = stats["head"]
    return head, head_vars


def _make_vol(model, preprocess, dtype):
    """batch dict -> preprocessed (B,D,H,W,1) volume in ``dtype``."""

    def _vol(batch):
        if preprocess is not None:
            batch = preprocess(batch)
        x = batch[model.input_key]
        if x.ndim == 4:
            x = x[..., None]
        return x.astype(dtype)

    return _vol


def quantize_anat_cnn(model, variables: dict, calib_batches,
                      preprocess=None, stem_s2d=None):
    """(AnatCNN, trained variables) -> (serve_fn, qtree).

    ``serve_fn(batch)`` matches the Predictor output contract:
    {'logits', 'probs', 'embeddings'}; the head (and its 'backbone_gap'
    tap) runs in f32 on the dequantized feature map. ``calib_batches``
    iterates raw batch dicts; ``preprocess`` is the same fused
    normalization fn the float Predictor uses.

    ``stem_s2d``: None derives the stem layout from the model and the
    calibration input (the default); True/False force it. Both layouts
    are exact (the param is the canonical 7^3 kernel either way), so
    this is purely a serving-performance knob — the s2d relayout costs
    ~3.6 ms of unfused int8 passes at batch 128 (BASELINE.md).
    """
    depth = model.resnet_depth
    folded = fold_backbone(variables, depth)
    _vol = _make_vol(model, preprocess, jnp.float32)

    vols = [_vol(b) for b in calib_batches]
    if stem_s2d is None:
        # Mirror the backbone's own runtime fallback (resnet3d.py:285):
        # the s2d stem layout requires a single input channel.
        stem_s2d = model.stem_s2d and vols[0].shape[-1] == 1
    elif stem_s2d and vols[0].shape[-1] != 1:
        raise ValueError("s2d stem requires a single input channel")
    absmax = calibrate_backbone(folded, vols, depth=depth,
                                dilated=model.dilated, stem_s2d=stem_s2d)
    qtree = quantize_backbone(folded, absmax, depth=depth,
                              dilated=model.dilated, stem_s2d=stem_s2d)
    head, head_vars = _anat_head_and_vars(model, variables)

    def serve_fn(batch):
        fmap = int8_backbone_apply(qtree, _vol(batch))
        out = head.apply(head_vars, fmap, train=False)
        return {"logits": out["logits"],
                "probs": jax.nn.softmax(out["logits"], axis=-1),
                "embeddings": out["embeddings"]}

    return serve_fn, qtree


def fold_anat_cnn(model, variables: dict, preprocess=None,
                  dtype=jnp.bfloat16):
    """BN-folded float serving for an AnatCNN — no quantization.

    Same output contract as ``quantize_anat_cnn`` but the backbone runs
    the folded conv+bias graph in ``dtype`` instead of int8. Folding is
    exact algebra; beyond removing the BN-affine passes, the folded
    graph dodges an XLA emitter pathology in the flax eval graph
    (layer2_block0's stride-2-adjacent conv is emitted 8x above its
    roofline there — BASELINE.md serve budget), so this is the fastest
    *float* serving path.
    """
    depth = model.resnet_depth
    folded = jax.tree_util.tree_map(
        lambda a: a.astype(dtype), fold_backbone(variables, depth))
    _vol = _make_vol(model, preprocess, dtype)
    head, head_vars = _anat_head_and_vars(model, variables)

    def serve_fn(batch):
        x = _vol(batch)
        stem_s2d = model.stem_s2d and x.shape[-1] == 1
        fmap = folded_backbone_apply(folded, x, depth=depth,
                                     dilated=model.dilated,
                                     stem_s2d=stem_s2d)
        out = head.apply(head_vars, fmap, train=False)
        return {"logits": out["logits"].astype(jnp.float32),
                "probs": jax.nn.softmax(
                    out["logits"].astype(jnp.float32), axis=-1),
                "embeddings": out["embeddings"]}

    return serve_fn, folded


# --------------------------------------------------------------------------
# PET conv tower (SmallPETCNN) quantization
# --------------------------------------------------------------------------
#
# The PET family (models/pet_models/pet_cnn.py) is n x (conv 'same' ->
# [BN] -> ReLU -> MaxPool(2)) -> GAP -> f32 head. Serving reuses the
# training path's parity decomposition (models/layers.py:S2DConvReLUPool)
# for the small-channel blocks — XLA has no efficient emitter for
# small-C_in stride-1 3D convs in int8 either — with the conv run on the
# MXU's 2x int8 mode. BN blocks fold exactly (conv bias included) and
# take the plain conv -> relu -> int8-pool form. The head (GAP + two
# Dense) is <0.1% of FLOPs and stays f32, preserving the 'gap'/'dense'
# embedding taps the stage-2 fusions consume (anat_pet_fusion.py:27-34).


def _pool2_f32(x):
    """MaxPool3d(2) floor semantics (layers.max_pool3d VALID window)."""
    return lax.reduce_window(x, -jnp.inf, lax.max, (1, 2, 2, 2, 1),
                             (1, 2, 2, 2, 1), "VALID")


def _pool2_int8(q):
    return lax.reduce_window(q, jnp.int8(-128), lax.max, (1, 2, 2, 2, 1),
                             (1, 2, 2, 2, 1), "VALID")


def _pool2(ctx, x):
    return _pool2_int8(x) if isinstance(ctx, _Int8Ctx) else _pool2_f32(x)


def _s2d_pool_kernel(w):
    """(k,k,k,cin,F) kernel -> (3,3,3,8cin,8F) parity-gathered layout.

    Mirrors models/layers.py:S2DConvReLUPool exactly (zero taps stay
    exact zeros, so the transform commutes with symmetric int8
    quantization — gather the already-quantized kernel)."""
    from multimodal_alzheimer_tpu.models.layers import _s2d_flat_index

    k, _, _, cin, f = w.shape
    wf = w.reshape(k ** 3, cin, f)
    wf = jnp.concatenate([wf, jnp.zeros((1, cin, f), w.dtype)], axis=0)
    gathered = wf[_s2d_flat_index(k)]          # (3,3,3, 8s, 8r, cin, F)
    return gathered.transpose(0, 1, 2, 3, 5, 4, 6).reshape(
        3, 3, 3, 8 * cin, 8 * f)


def _s2d_pool_input(x):
    """Pad-to-even + 2x2x2 space-to-depth (s-major, cin-minor); exact on
    int8 (symmetric zero point) and f32 alike. Returns the transformed
    tensor and the original spatial dims for the output slice."""
    b, d, h, w, cin = x.shape
    if min(d, h, w) < 2:
        raise ValueError(
            f"PET tower too deep for spatial dims {(d, h, w)}")
    dp, hp, wp = d + d % 2, h + h % 2, w + w % 2
    xe = jnp.pad(x, ((0, 0), (0, dp - d), (0, hp - h), (0, wp - w),
                     (0, 0)))
    X = xe.reshape(b, dp // 2, 2, hp // 2, 2, wp // 2, 2, cin)
    X = X.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
        b, dp // 2, hp // 2, wp // 2, 8 * cin)
    return X, (d, h, w)


def _pet_block_specs(model, variables):
    """Per-block serving plan. ``fused`` uses the parity decomposition
    (odd kernel, C_in <= 8 — layers.ConvBlock3D's measured crossover);
    it is exact, so serving applies it regardless of the model's
    ``s2d_pool`` training knob. BatchNorm does not opt a block out:
    ``fold_pet_tower`` collapses eval-mode BN into the conv kernel+bias
    first, leaving exactly the conv'-relu-pool form the decomposition
    handles — without this, BN towers would serve through the naive
    small-C_in stride-1 3D conv XLA emits ~8-20x above roofline
    (models/layers.py)."""
    specs = []
    params = variables["params"]["convs"]
    for i, (f, k) in enumerate(zip(model.conv_out, model.filter_size)):
        name = f"block_{i}"
        cin = int(params[name]["conv"]["kernel"].shape[3])
        fused = k % 2 == 1 and cin <= 8
        specs.append({"name": name, "features": int(f), "k": int(k),
                      "cin": cin, "fused": fused})
    return specs


def _fold_conv_bn(conv_p: dict, bn_p: dict, bn_s: dict, eps: float = _EPS):
    """conv(+bias) -> BN(eval) == conv(folded kernel) + folded bias."""
    g = bn_p["scale"] / jnp.sqrt(bn_s["var"] + eps)
    bias = bn_p["bias"] + g * (conv_p.get("bias", 0.0) - bn_s["mean"])
    return {"w": conv_p["kernel"] * g, "bias": bias}


def fold_pet_tower(model, variables: dict, specs=None) -> dict:
    """Every PET conv block -> canonical {'w', 'bias'} f32 entries (BN
    folded where present — exact algebra)."""
    specs = specs or _pet_block_specs(model, variables)
    params = variables["params"]["convs"]
    stats = variables.get("batch_stats", {}).get("convs", {})
    folded = {}
    for sp in specs:
        p = params[sp["name"]]
        if "bn" in p:
            folded[sp["name"]] = _fold_conv_bn(p["conv"], p["bn"],
                                               stats[sp["name"]]["bn"])
        else:
            folded[sp["name"]] = {"w": p["conv"]["kernel"],
                                  "bias": p["conv"]["bias"]}
    return folded


def _pet_calib_tree(folded: dict, specs) -> dict:
    """Fused blocks get the gathered (3,3,3,8cin,8F) kernel + r-tiled
    bias so calibration runs the same graph shape the int8 serve will."""
    tree = {}
    for sp in specs:
        e = folded[sp["name"]]
        if sp["fused"]:
            tree[sp["name"]] = {"w": _s2d_pool_kernel(e["w"]),
                                "bias": jnp.tile(e["bias"], 8)}
        else:
            tree[sp["name"]] = e
    return tree


def _quantize_fused_kernel(entry, in_scale: float):
    """Per-out-channel int8 of the canonical (k,k,k,cin,F) kernel, THEN
    the parity gather (zero taps stay exact int8 zeros). The 8F epilogue
    channels are r-major, so scales/bias tile per output parity."""
    w = entry["w"]
    sw = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    sw = jnp.maximum(sw, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / sw), -127, 127).astype(jnp.int8)
    return {"wq": _s2d_pool_kernel(wq),
            "scale": (jnp.tile(sw, 8) * in_scale).astype(jnp.float32),
            "bias": jnp.tile(entry["bias"], 8).astype(jnp.float32)}


def _pet_tower_forward(tree, x, ctx, specs):
    """(B,D,H,W,C) -> (B,d,h,w,F_last) f32 feature map; one graph for
    calibration (f32) and serving (int8), requant sites named alike.

    int32 accumulator safety: the largest contraction is 27 taps x
    8*C_in(<=64) x 127^2 < 2^25."""
    carrier = ctx.requant("in", x)
    last = len(specs) - 1
    for i, sp in enumerate(specs):
        blk = tree[sp["name"]]
        with jax.named_scope(sp["name"]):
            if sp["fused"]:
                X, (d, h, w) = _s2d_pool_input(carrier)
                # Asymmetric pad = SAME + tail slice without the slice
                # pass (mirrors models/layers.py:S2DConvReLUPool).
                pad = [(1, 0 if dim % 2 else 1) for dim in (d, h, w)]
                y = jax.nn.relu(ctx.conv(blk, X, 1, 1, pad=pad))
                y = y.reshape(y.shape[:4] + (8, sp["features"]))
                y = jnp.max(y, axis=4)
                if i == last:
                    return y
                carrier = ctx.requant(f"{sp['name']}/out", y)
            else:
                y = jax.nn.relu(ctx.conv(blk, carrier, 1, 1, pad="SAME"))
                if i == last:
                    return _pool2_f32(y)
                # absmax pre-pool == post-pool for the kept windows; the
                # int8 pool then commutes with the requant (exact).
                carrier = _pool2(ctx, ctx.requant(f"{sp['name']}/out", y))
    raise AssertionError("unreachable")


def quantize_pet_cnn(model, variables: dict, calib_batches,
                     preprocess=None):
    """(SmallPETCNN, trained variables) -> (serve_fn, qtree).

    Same contract as ``quantize_anat_cnn``: ``serve_fn(batch)`` returns
    {'logits', 'probs', 'embeddings'} with the 'gap'/'dense' taps the
    stage-2 fusions cut on (reference anat_pet_fusion.py:28-31); conv
    blocks run int8 on the MXU's 2x mode, the GAP + Dense head in f32.

    MEASURED VERDICT (v5e, batch 128, 91^3, tools/bench_serving.py
    --int8): int8 LOSES on this tower — 6691 vol/s vs 8046 bf16 (and
    3-stage fusion with both imaging towers int8: 1524 vs 1584 with the
    int8 MRI tower alone). The PET tower's convs are small-contraction
    (<=27 taps x 64 ch) and relayout/bandwidth-bound, so the MXU's 2x
    int8 peak never engages while the f32->int8 requant passes add HBM
    traffic. Kept as a tested option (drift argmax 1.0, prob err 3e-3);
    production serving uses the bf16 fused-s2d float path and
    ``quantize_pet=False`` (the default) in the fusion quantizers. int8
    wins only where the tower is MXU-bound (the ResNet backbones:
    1896 vs 1019 on the flagship).
    """
    specs = _pet_block_specs(model, variables)
    folded = fold_pet_tower(model, variables, specs)
    _vol = _make_vol(model, preprocess, jnp.float32)
    calib_tree = _pet_calib_tree(folded, specs)

    @jax.jit
    def one(x):
        ctx = _CalibCtx()
        _pet_tower_forward(calib_tree, x, ctx, specs)
        return ctx.absmax

    absmax: Dict[str, float] = {}
    for b in calib_batches:
        out = jax.device_get(one(_vol(b)))
        for k, v in out.items():
            absmax[k] = max(absmax.get(k, 0.0), float(v))
    scales = {k: max(v, 1e-12) / 127.0 for k, v in absmax.items()}

    qtree: dict = {"scales": scales, "specs": specs}
    site = "in"
    for sp in specs:
        quantizer = (_quantize_fused_kernel if sp["fused"]
                     else _quantize_kernel)
        qtree[sp["name"]] = quantizer(folded[sp["name"]], scales[site])
        site = f"{sp['name']}/out"

    p = variables["params"]

    def serve_fn(batch):
        fmap = _pet_tower_forward(qtree, _vol(batch), _Int8Ctx(scales),
                                  specs)
        h = jnp.mean(fmap, axis=(1, 2, 3))  # GAP (dropout is eval no-op)
        embeddings = {"gap": h}
        if model.linear_out:
            h = jax.nn.relu(h @ p["hidden"]["kernel"]
                            + p["hidden"]["bias"])
            embeddings["dense"] = h
        logits = h @ p["cls"]["kernel"] + p["cls"]["bias"]
        return {"logits": logits.astype(jnp.float32),
                "probs": jax.nn.softmax(logits.astype(jnp.float32), -1),
                "embeddings": embeddings}

    return serve_fn, qtree


def _quantize_tower(mri_model, tower_vars: dict, pre_batches):
    """Quantize one AnatCNN tower given its variable subtree and already-
    preprocessed calibration batches; returns (serve_mri, qtree)."""
    return quantize_anat_cnn(mri_model, tower_vars, pre_batches,
                             preprocess=None)


def _fusion_serve_with_towers(fusion, variables, serves: dict, preprocess):
    """Serve a fusion with externally-computed stage-1 towers (int8 or
    BN-folded) fed through the ``towers`` hook (keys 'mri'/'pet'); the
    remaining towers and fusion heads stay in the model dtype."""

    def serve_fn(batch):
        pre = dict(preprocess(batch)) if preprocess is not None else batch
        towers = {}
        for key, fn in serves.items():
            out = fn(pre)
            towers[key] = {"logits": out["logits"],
                           "embeddings": out["embeddings"]}
        out = fusion.apply(variables, pre, train=False, towers=towers)
        return {"logits": out["logits"],
                "probs": jax.nn.softmax(out["logits"], axis=-1),
                "embeddings": out["embeddings"]}

    return serve_fn


def _fusion_serve_with_mri(fusion, variables, serve_mri, preprocess):
    return _fusion_serve_with_towers(fusion, variables, {"mri": serve_mri},
                                     preprocess)


def _stage2_mri_vars(fusion, variables):
    return {"params": variables["params"]["mri_model"],
            "batch_stats": variables["batch_stats"]["mri_model"]}


def _stage3_mri_vars(fusion, variables):
    return {
        "params": variables["params"]["model_anat_pet"]["mri_model"],
        "batch_stats":
            variables["batch_stats"]["model_anat_pet"]["mri_model"],
    }


def _sub_vars(variables: dict, *path):
    """Variable subtree for a nested submodule; batch_stats only when the
    submodule has any (the default SmallPETCNN is BN-free)."""
    out = {"params": variables["params"]}
    stats = variables.get("batch_stats", {})
    for name in path:
        out["params"] = out["params"][name]
        stats = stats.get(name, {}) if isinstance(stats, dict) else {}
    if stats:
        out["batch_stats"] = stats
    return out


def _quantized_pet_serve(fusion, variables, pre_batches, *, stage3: bool):
    pet_path = (("model_anat_pet", "pet_model") if stage3
                else ("pet_model",))
    pet_model = (fusion.model_anat_pet.pet_model if stage3
                 else fusion.pet_model)
    return quantize_pet_cnn(pet_model, _sub_vars(variables, *pet_path),
                            pre_batches)


def fold_mri_fusion(fusion, variables: dict, preprocess=None,
                    dtype=jnp.bfloat16):
    """BN-folded MRI tower for a stage-2 fusion (the float analogue of
    ``quantize_mri_fusion`` — exact algebra, no calibration needed)."""
    serve_mri, ftree = fold_anat_cnn(
        fusion.mri_model, _stage2_mri_vars(fusion, variables),
        dtype=dtype)
    return (_fusion_serve_with_mri(fusion, variables, serve_mri,
                                   preprocess), ftree)


def fold_all_modalities_fusion(fusion, variables: dict, preprocess=None,
                               dtype=jnp.bfloat16):
    """BN-folded MRI tower for the 3-stage fusion serve (the float
    analogue of ``quantize_all_modalities_fusion``; requires the frozen
    shared-tower regime like its int8 counterpart)."""
    serve_mri, ftree = fold_anat_cnn(
        fusion.model_anat_pet.mri_model,
        _stage3_mri_vars(fusion, variables), dtype=dtype)
    return (_fusion_serve_with_mri(fusion, variables, serve_mri,
                                   preprocess), ftree)


def quantize_mri_fusion(fusion, variables: dict, calib_batches,
                        preprocess=None, quantize_pet: bool = False):
    """int8 MRI tower for a stage-2 fusion (AnatPETFusion /
    TabularMRIFusion — any fusion whose ``__call__`` accepts
    ``towers={'mri': ...}`` and owns an ``mri_model`` submodule).

    The quantized tower's output dict enters through the ``towers``
    hook, so the float MRI forward is never traced; the partner tower
    (PET / tabular) and the fusion head stay in the model dtype.
    ``quantize_pet=True`` additionally replaces a SmallPETCNN partner
    tower with its int8 serve (``quantize_pet_cnn``).
    """
    pre_batches = ([dict(preprocess(b)) for b in calib_batches]
                   if preprocess is not None else list(calib_batches))
    serve_mri, qtree = _quantize_tower(
        fusion.mri_model, _stage2_mri_vars(fusion, variables), pre_batches)
    serves = {"mri": serve_mri}
    if quantize_pet:
        if not hasattr(fusion, "pet_model"):
            raise ValueError("quantize_pet: fusion has no pet_model tower")
        serves["pet"], pet_q = _quantized_pet_serve(
            fusion, variables, pre_batches, stage3=False)
        qtree = {"mri": qtree, "pet": pet_q}
    return (_fusion_serve_with_towers(fusion, variables, serves,
                                      preprocess), qtree)


def quantize_all_modalities_fusion(fusion, variables: dict, calib_batches,
                                   preprocess=None,
                                   quantize_pet: bool = False):
    """int8 serving for the 3-stage fusion: quantized MRI backbone fed to
    every consumer through the shared-tower path.

    The MRI tower dominates the 3-stage serve (BASELINE.md); the
    canonical copy (``model_anat_pet.mri_model``, the one the shared
    forward reads — all_modalities_fusion.py) is replaced by the int8
    backbone + f32 head, and its output dict enters the fusion graph via
    the external-``towers`` hook, so the float MRI tower is never traced.
    ``quantize_pet=True`` does the same for the shared PET tower
    (``model_anat_pet.pet_model``) via ``quantize_pet_cnn``. Remaining
    towers and all fusion heads stay in the model dtype.
    Requires the frozen shared-tower regime (``share_towers=True`` — the
    reference's default), which also guarantees the duplicate tower
    copies in the sibling sub-models hold identical weights.
    """
    pre_batches = ([dict(preprocess(b)) for b in calib_batches]
                   if preprocess is not None else list(calib_batches))
    serve_mri, qtree = _quantize_tower(
        fusion.model_anat_pet.mri_model,
        _stage3_mri_vars(fusion, variables), pre_batches)
    serves = {"mri": serve_mri}
    if quantize_pet:
        serves["pet"], pet_q = _quantized_pet_serve(
            fusion, variables, pre_batches, stage3=True)
        qtree = {"mri": qtree, "pet": pet_q}
    return (_fusion_serve_with_towers(fusion, variables, serves,
                                      preprocess), qtree)


def quantization_error(model, variables, serve_fn, batch,
                       preprocess=None) -> dict:
    """Float-vs-int8 drift report on one batch (for tests/validation).

    ``serve_fn`` (from quantize_anat_cnn) applies ``preprocess`` itself,
    so it receives the raw batch; the float reference gets the
    preprocessed one."""
    pre = dict(preprocess(batch)) if preprocess is not None else batch
    ref = model.apply(variables, pre, train=False)
    got = serve_fn(batch)
    rl, gl = np.asarray(ref["logits"]), np.asarray(got["logits"])
    denom = np.maximum(np.abs(rl).max(), 1e-12)
    return {
        "argmax_agree": float((rl.argmax(-1) == gl.argmax(-1)).mean()),
        "logit_max_rel_err": float(np.abs(rl - gl).max() / denom),
        "prob_max_abs_err": float(
            np.abs(np.asarray(ref.get("probs",
                                      jax.nn.softmax(ref["logits"], -1)))
                   - np.asarray(got["probs"])).max()),
    }
