"""Step-time budget profiler: region-by-region ms table of the flagship
train step (VERDICT round-2 item 7 — make the measured MFU auditable).

Runs bench.py's flagship train step (ResNet-18 3D @ 91x109x91, bf16,
batch 128) under ``jax.profiler.trace``, parses the resulting Perfetto
trace, and attributes every device-track event to a model region by
joining the XLA fusion name against the compiled HLO's ``op_name``
metadata (the recipe CLAUDE.md records from the round-2 profile).

Output: a region -> ms table on stderr summing to the measured step
time, plus one JSON line on stdout for records.

Run: ``python tools/profile_step.py [--batch 128] [--steps 3]``.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets up the compilation cache before jax use)


def _fusion_opnames(hlo_text: str) -> dict:
    """Map computation/instruction name -> set of op_name metadata strings.

    Fusion instructions carry the representative op's metadata; the fused
    computation's body instructions carry their own. We collect both: the
    trace names events after the fusion instruction (e.g. 'fusion.123'),
    and region classification wants every op_name inside that fusion.
    """
    # instruction -> its own op_name
    inst_op = {}
    # fusion instruction -> called computation name
    fusion_calls = {}
    # computation name -> list of op_names of its instructions
    comp_ops: dict = {}
    current_comp = None
    for line in hlo_text.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*(?:\([^)]*\))?\s*=", line)
        cm = re.match(r"\s*(?:ENTRY\s+)?%?([\w.\-]+)\s+\(", line)
        if "=" not in line and cm:
            current_comp = cm.group(1)
            comp_ops.setdefault(current_comp, [])
        if not m:
            continue
        name = m.group(1)
        om = re.search(r'op_name="([^"]*)"', line)
        if om and current_comp is not None:
            comp_ops.setdefault(current_comp, []).append(om.group(1))
        if om:
            inst_op[name] = om.group(1)
        fm = re.search(r"(?:calls|fusion)=%?([\w.\-]+)", line)
        if "fusion(" in line or "kind=k" in line:
            if fm:
                fusion_calls[name] = fm.group(1)
    return {"inst_op": inst_op, "fusion_calls": fusion_calls,
            "comp_ops": comp_ops}


def _build_pet_step(batch_size: int):
    """SmallPETCNN train step at the bench --all pet_3d_cnn config."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.losses import make_criterion
    from multimodal_alzheimer_tpu.models import SmallPETCNN
    from multimodal_alzheimer_tpu.ops.normalization import normalize_pet
    from multimodal_alzheimer_tpu.train import (
        TrainState,
        make_train_step,
        single_lr_optimizer,
    )

    model = SmallPETCNN.from_hparams(
        {"n_classes": 3, "conv_out": (8, 16, 32, 64),
         "filter_size": (5, 5, 3, 3), "linear_out": 64},
        dtype=jnp.bfloat16)
    criterion = make_criterion({"loss_class_weights": [0.4, 0.3, 0.3]})
    optimizer = single_lr_optimizer(1e-3)

    def preprocess(b):
        out = dict(b)
        out["pet1451"] = normalize_pet(out["pet1451"], 0.5145, 0.5383)
        return out

    rng = np.random.default_rng(0)
    batch = {
        "pet1451": jnp.asarray(
            rng.normal(0.5, 0.5, (batch_size,) + bench.VOLUME_SHAPE)
            .astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 3, batch_size), jnp.int32),
    }
    variables = model.init(jax.random.PRNGKey(0), preprocess(batch),
                           train=False)
    state = TrainState.create(variables, optimizer)
    step = make_train_step(model, criterion, optimizer, preprocess)
    return step, state, batch, jax.random.PRNGKey(1)


def _build_pet_serve_step(batch_size: int):
    """SmallPETCNN bf16 inference step (split-stats z-score preprocess
    fused) — the PET tower's serving forward, profiled region-by-region
    against its executed-FLOPs/HBM bounds."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.models import SmallPETCNN
    from multimodal_alzheimer_tpu.ops.normalization import normalize_pet

    model = SmallPETCNN.from_hparams(
        {"n_classes": 3, "conv_out": (8, 16, 32, 64),
         "filter_size": (5, 5, 3, 3), "linear_out": 64},
        dtype=jnp.bfloat16)

    def preprocess(b):
        out = dict(b)
        out["pet1451"] = normalize_pet(out["pet1451"], 0.5145, 0.5383)
        return out

    rng_np = np.random.default_rng(0)
    batch = {"pet1451": jnp.asarray(
        rng_np.normal(0.5, 0.5, (batch_size,) + bench.VOLUME_SHAPE)
        .astype(np.float32))}
    variables = model.init(jax.random.PRNGKey(0), preprocess(batch),
                           train=False)

    def core(state, b, rng):
        out = model.apply(variables, preprocess(b), train=False)
        probs = jax.nn.softmax(out["logits"], axis=-1)
        return state, {"loss": probs.astype(jnp.float32).sum()}

    return (jax.jit(core), jnp.float32(0.0), batch,
            jax.random.PRNGKey(1))


def _build_serve_step(batch_size: int, int8: bool, plain_stem=False,
                      folded=False):
    """Flagship serving step (memoized min-max preprocess), bf16 or int8
    — the tools/bench_serving.py configs, profiled region-by-region."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.models import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )
    from multimodal_alzheimer_tpu.ops.pallas_norm import (
        batched_masked_quantiles,
    )

    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": 18, "linear_out": (),
         "lr": 1e-3}, dtype=jnp.bfloat16)

    def preprocess(b):
        out = dict(b)
        out["mri"] = batched_normalize_mri(
            out["mri"], out.pop("mri_mask"),
            {"per_scan_norm": "min_max"}, 0.99,
            qminmax=out.pop("mri_qminmax"))
        return out

    rng_np = np.random.default_rng(0)
    batch = {
        "mri": jnp.asarray(
            rng_np.normal(900, 400, (batch_size,) + bench.VOLUME_SHAPE)
            .astype(np.float32)),
        "mri_mask": jnp.asarray(
            (rng_np.random((batch_size,) + bench.VOLUME_SHAPE) > 0.35)
            .astype(np.float32)),
    }
    batch["mri_qminmax"] = batched_masked_quantiles(
        batch["mri"], batch["mri_mask"], (0.01, 0.99))
    variables = model.init(jax.random.PRNGKey(0), preprocess(batch),
                           train=False)

    if int8:
        from multimodal_alzheimer_tpu.inference.quantize import (
            quantize_anat_cnn,
        )

        serve_q, _ = quantize_anat_cnn(
            model, variables, [batch], preprocess=preprocess,
            stem_s2d=False if plain_stem else None)

        def core(state, b, rng):
            out = serve_q(b)
            return state, {"loss": out["probs"]
                           .astype(jnp.float32).sum()}
    elif folded:
        from multimodal_alzheimer_tpu.inference.quantize import (
            fold_anat_cnn,
        )

        serve_f, _ = fold_anat_cnn(model, variables,
                                   preprocess=preprocess)

        def core(state, b, rng):
            out = serve_f(b)
            return state, {"loss": out["probs"]
                           .astype(jnp.float32).sum()}
    else:
        def core(state, b, rng):
            out = model.apply(variables, preprocess(b), train=False)
            probs = jax.nn.softmax(out["logits"], axis=-1)
            return state, {"loss": probs.astype(jnp.float32).sum()}

    return (jax.jit(core), jnp.float32(0.0), batch,
            jax.random.PRNGKey(1))


PET_REGIONS = (
    ("preprocess", (r"preprocess", r"normalize")),
    ("optimizer", (r"optimizer",)),
    ("block0", (r"block_0",)),
    ("block1", (r"block_1",)),
    ("block2", (r"block_2",)),
    ("block3", (r"block_3",)),
    ("head_loss", (r"hidden", r"cls", r"loss", r"softmax", r"log_softmax",
                   r"cross_entropy", r"logits", r"one_hot")),
)

REGIONS = (
    # (region, patterns matched against the joined op_name strings).
    # Order matters: block-internal conv1/bn1 names live under
    # layer{N}_block{M}/ scopes, so the layer patterns must win before
    # the stem's top-level conv1/bn1 patterns.
    ("preprocess", (r"preprocess", r"normalize", r"quantile", r"zscore",
                    r"radix")),
    ("optimizer", (r"optimizer",)),
    ("layer1", (r"layer1",)),
    ("layer2", (r"layer2",)),
    ("layer3", (r"layer3",)),
    ("layer4", (r"layer4",)),
    ("maxpool", (r"max_pool", r"select_and_scatter", r"reduce_window",
                 r"maxpool", r"SelectAndScatter")),
    ("stem", (r"conv1", r"bn1", r"stem", r"space_to_depth",
              r"SpaceToDepth")),
    ("head_loss", (r"head", r"Dense", r"loss", r"softmax", r"log_softmax",
                   r"cross_entropy", r"logits", r"one_hot")),
)


def classify(op_names, root=None, regions=REGIONS) -> str:
    """Region of an event; the fusion ROOT's own op_name wins outright.

    A fused computation's body often contains producer ops from the
    previous layer (e.g. a layer4 conv dgrad fusing layer3's residual
    add/BN mults as inputs) — majority-voting over the body misattributed
    layer4_block0/conv1's 9.8 ms dgrad to layer3 in the round-3 profile.
    The root instruction's metadata names the op the fusion exists for.
    """
    if root is not None:
        for region, pats in regions:
            if any(re.search(p, root) for p in pats):
                return region
    votes: dict = {}
    for op in op_names:
        for region, pats in regions:
            if any(re.search(p, op) for p in pats):
                votes[region] = votes.get(region, 0) + 1
                break
    if not votes:
        return "other"
    return max(votes, key=votes.get)


def emitter_report(hlo_text: str, meta: dict, region: str | None):
    """Per-fusion emitter + estimated_cycles rows for one region.

    The round-3 serve audit found flax-eval layer2's conv2+residual
    fusion emitted via ``EmitAllBatchInSublanes`` at 8x its roofline,
    with the backend_config's own ``estimated_cycles`` predicting the
    damage (BASELINE.md "flax-eval layer2 pathology"). This report asks
    the same question of any compiled graph — VERDICT r3 #7 asks it of
    the TRAIN step — straight from the compiled HLO, no trace needed.
    """
    rows = []
    for line in hlo_text.splitlines():
        if "fusion(" not in line:
            continue
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=", line)
        if not m:
            continue
        name = m.group(1)
        om = re.search(r'op_name="([^"]*)"', line)
        root_op = om.group(1) if om else None
        comp = meta["fusion_calls"].get(name)
        reg = classify(meta["comp_ops"].get(comp, []), root=root_op)
        if region and reg != region:
            continue
        emit = re.findall(r"Emit\w+", line)
        cyc = re.search(r'"?estimated_cycles"?[=:]\s*"?(\d+)', line)
        rows.append((int(cyc.group(1)) if cyc else 0, reg, name,
                     root_op or "", sorted(set(emit))))
    rows.sort(reverse=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--config", default="flagship",
                    choices=("flagship", "pet", "pet_serve", "serve",
                             "serve_int8"),
                    help="flagship = MRI ResNet-18 train step; pet = "
                         "SmallPETCNN train step; serve / serve_int8 = "
                         "bf16 / PTQ-int8 flagship inference step")
    ap.add_argument("--dump-hlo", action="store_true")
    ap.add_argument("--keep-trace", action="store_true")
    ap.add_argument("--folded", action="store_true",
                    help="serve only: BN-folded bf16 backbone instead of "
                         "the flax eval graph (emitter experiment)")
    ap.add_argument("--plain-stem", action="store_true",
                    help="serve_int8 only: force the plain stride-2 7^3 "
                         "stem instead of the s2d layout")
    ap.add_argument("--filter", default=None,
                    help="print EVERY device event classified into this "
                         "region (e.g. --filter layer3), largest first")
    ap.add_argument("--emitters", default=None, metavar="REGION",
                    help="compile-only: print each fusion's emitter tags "
                         "+ backend_config estimated_cycles for REGION "
                         "('all' for every region), largest first — the "
                         "layer2 emitter-pathology check (BASELINE.md)")
    args = ap.parse_args(argv)

    import jax

    if args.config == "pet":
        step, state, batch, rng = _build_pet_step(args.batch)
    elif args.config == "pet_serve":
        step, state, batch, rng = _build_pet_serve_step(args.batch)
    elif args.config in ("serve", "serve_int8"):
        step, state, batch, rng = _build_serve_step(
            args.batch, int8=args.config == "serve_int8",
            plain_stem=args.plain_stem, folded=args.folded)
    else:
        step, state, batch, rng = bench.build_step(args.batch)
    lowered = step.lower(state, batch, rng)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    meta = _fusion_opnames(hlo_text)
    if args.dump_hlo:
        with open("/tmp/profile_step_hlo.txt", "w") as f:
            f.write(hlo_text)
        print("HLO dumped to /tmp/profile_step_hlo.txt", file=sys.stderr)

    if args.emitters:
        region = None if args.emitters == "all" else args.emitters
        rows = emitter_report(hlo_text, meta, region)
        # 480 MHz-class TPU cores: cycles -> rough us; print raw cycles
        # (the serve audit compared cycles, not wall) plus the tags.
        for cyc, reg, name, root_op, emits in rows[:40]:
            print(f"{cyc:>12} cyc  {reg:<8} {name:<28} "
                  f"{','.join(emits) or '-':<28} {root_op}")
        print(json.dumps({
            "config": args.config, "region": args.emitters,
            "fusions": [{"cycles": c, "region": r, "name": n,
                         "emitters": e, "op": o}
                        for c, r, n, o, e in rows[:40]]}))
        return

    # Warm up (also populates the compile cache / tunnel session).
    for _ in range(3):
        state, aux = step(state, batch, rng)
    jax.block_until_ready(aux["loss"])

    logdir = tempfile.mkdtemp(prefix="profile_step_")
    jax.profiler.start_trace(logdir)
    for _ in range(args.steps):
        state, aux = step(state, batch, rng)
    jax.block_until_ready(aux["loss"])
    float(aux["loss"])  # real fetch: the tunnel's block can under-wait
    jax.profiler.stop_trace()

    traces = glob.glob(os.path.join(
        logdir, "**", "*.trace.json.gz"), recursive=True)
    if not traces:
        print(json.dumps({"error": "no trace produced", "logdir": logdir}))
        return
    with gzip.open(traces[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # Device-track pids: process names containing TPU/device. XLA traces
    # name them like '/device:TPU:0' or 'TPU:0 ...'.
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {pid for pid, name in pid_names.items()
                if "TPU" in name.upper() or "device" in name.lower()}
    # Exclude host-side threads of the device process (e.g. 'TPU runtime').
    tid_names = {(e["pid"], e["tid"]): e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"
                 and "args" in e}

    per_name: dict = {}
    env_by_track: dict = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        tname = tid_names.get((e["pid"], e.get("tid")), "")
        if any(k in tname.lower() for k in ("host", "runtime", "infeed")):
            continue
        # Envelope/container events overlap the leaf fusions and would
        # double-count: the whole-module span ('jit_train_step(...)') on
        # the XLA-Modules track and the per-step markers ('0', '1', ...)
        # on the Steps track. Sum each envelope track separately; the max
        # is the ground-truth device wall time for the traced steps.
        if re.fullmatch(r"\d+", e["name"]) or re.fullmatch(
                r"jit_\w+\(\d+\)", e["name"]):
            key = (e["pid"], e.get("tid"))
            env_by_track[key] = env_by_track.get(key, 0.0) \
                + e.get("dur", 0) / 1000.0
            continue
        per_name.setdefault(e["name"], [0.0, 0, tname])
        per_name[e["name"]][0] += e.get("dur", 0) / 1000.0  # us -> ms
        per_name[e["name"]][1] += 1

    # Join trace event names to HLO instructions and classify.
    regions = (PET_REGIONS if args.config in ("pet", "pet_serve")
               else REGIONS)
    region_ms: dict = {}
    unmatched = []
    filtered = []
    for name, (ms, count, tname) in per_name.items():
        base = name.split("/")[-1]
        ops = []
        if base in meta["inst_op"]:
            ops.append(meta["inst_op"][base])
        comp = meta["fusion_calls"].get(base)
        if comp and comp in meta["comp_ops"]:
            ops.extend(meta["comp_ops"][comp])
        # Trace names often ARE the fused-computation names.
        if base in meta["comp_ops"]:
            ops.extend(meta["comp_ops"][base])
        if not ops:
            ops = [name]
            unmatched.append((ms, name))
        region = classify(ops, root=meta["inst_op"].get(base),
                          regions=regions)
        region_ms[region] = region_ms.get(region, 0.0) + ms
        if args.filter and region == args.filter:
            filtered.append((ms, name, ops[0] if ops else ""))

    if args.filter:
        filtered.sort(reverse=True)
        total_f = sum(ms for ms, _, _ in filtered)
        print(f"\n== every '{args.filter}' event ({total_f / args.steps:.1f}"
              f" ms/step over {len(filtered)} names) ==", file=sys.stderr)
        for ms, name, hint in filtered:
            print(f"  {ms / args.steps:8.2f} ms  {name[:44]:<44} "
                  f"{hint[:80]}", file=sys.stderr)

    total = sum(region_ms.values()) / args.steps
    wall = max(env_by_track.values()) / args.steps if env_by_track else 0.0
    print(f"\n== step-time budget (batch {args.batch}, {args.steps} traced "
          f"steps, device-track ms / step) ==", file=sys.stderr)
    for region in sorted(region_ms, key=region_ms.get, reverse=True):
        ms = region_ms[region] / args.steps
        print(f"  {region:<12} {ms:8.1f} ms  ({100 * ms / total:4.1f}%)",
              file=sys.stderr)
    print(f"  {'TOTAL':<12} {total:8.1f} ms  (step wall {wall:.1f} ms; "
          f"gap = scheduling bubbles)", file=sys.stderr)
    unmatched.sort(reverse=True)
    if unmatched:
        print("\ntop unmatched event names (classified by name only):",
              file=sys.stderr)
        for ms, name in unmatched[:10]:
            print(f"  {ms / args.steps:8.1f} ms  {name}", file=sys.stderr)

    # Top individual events for drill-down.
    top = sorted(per_name.items(), key=lambda kv: kv[1][0], reverse=True)
    print("\ntop events:", file=sys.stderr)
    for name, (ms, count, tname) in top[:25]:
        base = name.split("/")[-1]
        ops = meta["comp_ops"].get(base) or (
            [meta["inst_op"][base]] if base in meta["inst_op"] else [])
        hint = ops[0] if ops else ""
        print(f"  {ms / args.steps:8.1f} ms x{count:<3} {name[:60]:<60} "
              f"{hint[:70]}", file=sys.stderr)

    if not args.keep_trace:
        import shutil

        shutil.rmtree(logdir, ignore_errors=True)
    else:
        print(f"trace kept: {traces[0]}", file=sys.stderr)

    print(json.dumps({
        "metric": "step_budget_ms",
        "batch": args.batch,
        "regions": {k: round(v / args.steps, 1)
                    for k, v in region_ms.items()},
        "total_ms": round(total, 1),
        "step_wall_ms": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
