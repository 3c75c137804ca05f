"""Serving-path benchmark: Predictor + exported-artifact throughput.

Measures the production inference surfaces on the real chip (the
reference has neither — it only evaluates via Lightning trainer.test):

1. ``inference.predictor.Predictor``'s jitted serve computation —
   softmax'd logits + embedding taps with the production quantile
   min-max MRI normalization fused into the jit (reference
   preprocessing: pkg/utils/dataloader.py:261-270). Device-resident
   input: on this rig repeated large host->device transfers through the
   axon tunnel degrade monotonically (a tunnel property measured in
   round 2 — 145 -> 5 vol/s across identical runs), so host-path
   numbers say nothing about the serving stack. Pass ``--host`` to
   measure the full host->host ``predict_batch`` anyway (includes
   padding, H2D and D2H).
2. ``inference.export`` — the StableHLO artifact round-trip
   (export -> serialize -> deserialize -> call), same fused
   preprocessing, device-resident input.

Timing methodology: ``jax.block_until_ready`` is NOT trusted here — on
this rig it can return in <1 ms while the dispatched executions are
still in flight behind the tunnel (measured live; a subsequent scalar
fetch then absorbs all the queued work). Per CLAUDE.md, only
chained-state end-to-end loops are reliable, so:

* the Predictor number comes from a ``lax.scan`` of K serve steps with
  a data dependency between iterations (the step's probs perturb the
  next step's input by 1e-20), timed around a real scalar fetch;
* the exported-artifact number comes from K sequential ``call``s timed
  around a real data fetch of the LAST output (executions on the single
  device stream are ordered, so the fetch drains all K), with the
  fetch-only overhead measured separately and reported.

Prints one human line per surface to stderr and a JSON summary line to
stdout. Run: ``python tools/bench_serving.py [--batch 128] [--host]``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOLUME_SHAPE = (91, 109, 91)


def _host_batch(batch_size: int, rng):
    return {
        "mri": rng.normal(900, 400, (batch_size,) + VOLUME_SHAPE)
        .astype(np.float32),
        "mri_mask": (rng.random((batch_size,) + VOLUME_SHAPE) > 0.35)
        .astype(np.float32),
    }


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--host", action="store_true",
                        help="also measure host->host predict_batch "
                             "(tunnel-bound on remote-TPU rigs)")
    parser.add_argument("--int8", action="store_true",
                        help="also measure the PTQ int8 serving path "
                             "(inference/quantize.py)")
    parser.add_argument("--skip-float", action="store_true",
                        help="skip the float surfaces (quick int8-only "
                             "runs)")
    parser.add_argument("--fast", action="store_true",
                        help="strided backbone (dilated=False): the "
                             "documented ~2x performance mode — NOT "
                             "reference-parity activations (resnet3d.py)")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.inference.export import (
        export_model,
        load_exported,
    )
    from multimodal_alzheimer_tpu.inference.predictor import Predictor
    from multimodal_alzheimer_tpu.models import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )

    b = args.batch
    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": 18, "linear_out": (),
         "batchnorm_begin": False, "lr": 1e-3}, dtype=jnp.bfloat16,
        dilated=not args.fast)

    def preprocess(batch):
        out = dict(batch)
        out["mri"] = batched_normalize_mri(
            out["mri"], out.pop("mri_mask"),
            {"per_scan_norm": "min_max"}, 0.99)
        return out

    rng = np.random.default_rng(0)
    host = _host_batch(b, rng)
    dev = {k: jnp.asarray(v) for k, v in host.items()}
    variables = model.init(jax.random.PRNGKey(0), preprocess(dev),
                           train=False)

    results = {}
    pred = Predictor(model, variables, batch_size=b, preprocess=preprocess)
    tag0 = jnp.float32(0.0)

    def _chain_and_time(core, variables, batch, label, key,
                        chain_keys=("mri",)):
        """Scan-chain ``core`` x iters with a data dependency between
        iterations (probs perturb the next input), timed around a real
        scalar fetch — the only trustworthy methodology on this rig
        (see module docstring).

        ``chain_keys`` must list EVERY model input that feeds real
        compute: an input left out of the chain is a scan-loop constant,
        and XLA's while-loop invariant code motion hoists its whole
        consumer tower OUT of the timed loop (measured: the 3-stage
        fusion serve "cost" exactly its MRI tower until the PET/tabular
        inputs joined the chain — a ~17 ms/batch PET tower vanished from
        the measurement)."""

        @jax.jit
        def chained(variables, batch, tag0):
            def body(tag, _):
                bb = dict(batch)
                for ck in chain_keys:
                    bb[ck] = batch[ck] + tag
                out = core(variables, bb)
                return out["probs"].astype(jnp.float32).sum() * 1e-20, ()
            tag, _ = jax.lax.scan(body, tag0, None, length=args.iters)
            return tag

        float(chained(variables, batch, tag0))  # compile + warm
        t0 = time.perf_counter()
        tag = float(chained(variables, batch, tag0))
        dt = time.perf_counter() - t0
        assert np.isfinite(tag)
        results[key] = round(b * args.iters / dt, 1)
        results[key.replace("_vol_s", "_batch_ms")] = round(
            dt / args.iters * 1000, 1)
        print(f"{label} (batch {b}, scan-chained x{args.iters}): "
              f"{results[key]} vol/s", file=sys.stderr)

    # --- Predictor's jitted serve fn: scan-chained ground truth. ---
    if not args.skip_float:
        _chain_and_time(
            pred._raw_fn, pred.variables, dev,
            "Predictor jitted serve (min-max fused, logits+probs+"
            "embeddings)", "predictor_fn_vol_s")

    # --- Memoized-quantile serve: the steady-state production path. ---
    # Per-scan min-max bounds are training-invariant; the dataset memoizes
    # them (data/dataset.py:_minmax_bounds) so serving pays only the
    # elementwise apply, not the 32-pass radix selection per batch.
    from multimodal_alzheimer_tpu.ops.pallas_norm import (
        batched_masked_quantiles,
    )

    def preprocess_memo(batch):
        out = dict(batch)
        out["mri"] = batched_normalize_mri(
            out["mri"], out.pop("mri_mask"),
            {"per_scan_norm": "min_max"}, 0.99,
            qminmax=out.pop("mri_qminmax"))
        return out

    dev_memo = dict(dev)
    dev_memo["mri_qminmax"] = batched_masked_quantiles(
        dev["mri"], dev["mri_mask"], (0.01, 0.99))
    pred_memo = Predictor(model, variables, batch_size=b,
                          preprocess=preprocess_memo)
    if not args.skip_float:
        _chain_and_time(
            pred_memo._raw_fn, pred_memo.variables, dev_memo,
            "Predictor jitted serve, memoized quantiles (apply-only "
            "min-max)", "predictor_memo_vol_s")

        # BN-folded bf16 serve: exact-algebra folding; also dodges the
        # flax eval graph's layer2 emitter pathology (BASELINE.md).
        from multimodal_alzheimer_tpu.inference.quantize import (
            fold_anat_cnn,
        )

        serve_f, _ = fold_anat_cnn(model, variables,
                                   preprocess=preprocess_memo)
        _chain_and_time(
            lambda _, bb: serve_f(bb), None, dev_memo,
            "BN-folded bf16 serve (memoized quantiles)",
            "folded_vol_s")

    # --- 3-stage fusion construction (shared by float + int8 benches) ---
    from multimodal_alzheimer_tpu.models import AllModalitiesFusion

    def _build_fusion():
        pet_hp = {"n_classes": 3, "conv_out": (8, 16, 32, 64),
                  "filter_size": (5, 5, 3, 3), "linear_out": 64}
        mri_hp = {"n_classes": 3, "resnet_depth": 18, "linear_out": ()}
        tab_hp = {"n_classes": 3, "hidden": (256, 1024)}
        fusion = AllModalitiesFusion.from_hparams(
            {"n_classes": 3, "lr": 1e-3, "lr_pretrained": None},
            {"n_classes": 3}, {"n_classes": 3}, {"n_classes": 3},
            pet_hp, mri_hp, tab_hp, dtype=jnp.bfloat16)

        def preprocess3(batch):
            out = preprocess_memo(batch)
            out["pet1451"] = (out["pet1451"] - 0.5145) / 0.5383
            return out

        dev3 = dict(dev_memo)
        dev3["pet1451"] = jnp.asarray(
            rng.normal(0.5, 0.5, (b,) + VOLUME_SHAPE).astype(np.float32))
        dev3["tabular"] = jnp.asarray(rng.normal(size=(b, 9))
                                      .astype(np.float32))
        from multimodal_alzheimer_tpu.train.checkpoint import (
            sync_tower_duplicates,
        )
        v3 = sync_tower_duplicates(fusion.init(
            jax.random.PRNGKey(0), preprocess3(dev3), train=False))
        return fusion, v3, dev3, preprocess3

    # --- PTQ int8 serving path (inference/quantize.py). ---
    # Same output contract, memoized min-max preprocessing; int8 weights
    # and activations through the backbone (the v5e MXU's 2x-peak mode),
    # f32 head. Drift vs the float model is reported alongside.
    if args.int8:
        from multimodal_alzheimer_tpu.inference.quantize import (
            quantization_error,
            quantize_anat_cnn,
        )

        serve_q, _ = quantize_anat_cnn(model, variables, [dev_memo],
                                       preprocess=preprocess_memo)
        qerr = quantization_error(model, variables, serve_q, dev_memo,
                                  preprocess=preprocess_memo)
        results["int8_argmax_agree"] = round(qerr["argmax_agree"], 4)
        results["int8_logit_rel_err"] = round(
            qerr["logit_max_rel_err"], 4)
        print(f"int8 drift vs float: argmax agree "
              f"{qerr['argmax_agree']:.4f}, max logit rel err "
              f"{qerr['logit_max_rel_err']:.4f}", file=sys.stderr)
        _chain_and_time(
            lambda _, bb: serve_q(bb), None, dev_memo,
            "int8 Predictor serve (PTQ backbone, memoized min-max)",
            "int8_vol_s")

        def _bench_int8_pet():
            """PET tower standalone: bf16 eval graph vs the int8 parity-
            decomposed serve (quantize_pet_cnn)."""
            from multimodal_alzheimer_tpu.inference.quantize import (
                quantize_pet_cnn,
            )
            from multimodal_alzheimer_tpu.models import SmallPETCNN

            pet_hp = {"n_classes": 3, "conv_out": (8, 16, 32, 64),
                      "filter_size": (5, 5, 3, 3), "linear_out": 64}
            pet = SmallPETCNN.from_hparams(pet_hp, dtype=jnp.bfloat16)
            dev_pet = {"pet1451": jnp.asarray(
                rng.normal(0.5, 0.5, (b,) + VOLUME_SHAPE)
                .astype(np.float32))}

            def pre_pet(batch):
                out = dict(batch)
                out["pet1451"] = (out["pet1451"] - 0.5145) / 0.5383
                return out

            vp = pet.init(jax.random.PRNGKey(0), pre_pet(dev_pet),
                          train=False)

            def serve_float(bb):
                out = pet.apply(vp, pre_pet(bb), train=False)
                return {"probs": jax.nn.softmax(out["logits"], -1), **out}

            _chain_and_time(
                lambda _, bb: serve_float(bb), None, dev_pet,
                "PET CNN bf16 serve (fused s2d-pool blocks)",
                "pet_bf16_vol_s", chain_keys=("pet1451",))

            serve_pq, _ = quantize_pet_cnn(pet, vp, [dev_pet],
                                           preprocess=pre_pet)
            qerrp = quantization_error(pet, vp, serve_pq, dev_pet,
                                       preprocess=pre_pet)
            results["pet_int8_argmax_agree"] = round(
                qerrp["argmax_agree"], 4)
            print(f"PET int8 drift vs float: argmax agree "
                  f"{qerrp['argmax_agree']:.4f}, max prob abs err "
                  f"{qerrp['prob_max_abs_err']:.4f}", file=sys.stderr)
            _chain_and_time(
                lambda _, bb: serve_pq(bb), None, dev_pet,
                "int8 PET CNN serve (PTQ fused blocks)",
                "pet_int8_vol_s", chain_keys=("pet1451",))

        def _bench_int8_fusion():
            from multimodal_alzheimer_tpu.inference.quantize import (
                quantize_all_modalities_fusion,
            )

            fusion, v3, dev3, preprocess3 = _build_fusion()
            # Drift checks run the serves EAGERLY (quantization_error);
            # at batch 128 a single eager f32 stem buffer is ~4.7 GB and
            # OOMs once the float-section executables are resident — a
            # 32-sample slice gives the same drift stats.
            dev3_s = {k: v[:32] for k, v in dev3.items()}
            serve3_q, _ = quantize_all_modalities_fusion(
                fusion, v3, [dev3], preprocess=preprocess3)
            qerr3 = quantization_error(fusion, v3, serve3_q, dev3_s,
                                       preprocess=preprocess3)
            results["int8_3stage_argmax_agree"] = round(
                qerr3["argmax_agree"], 4)
            print(f"int8 3-stage drift vs float: argmax agree "
                  f"{qerr3['argmax_agree']:.4f}, max prob abs err "
                  f"{qerr3['prob_max_abs_err']:.4f}", file=sys.stderr)
            _chain_and_time(
                lambda _, bb: serve3_q(bb), None, dev3,
                "int8 3-stage fusion serve (int8 MRI tower, shared "
                "towers, memoized min-max)", "int8_3stage_vol_s",
                chain_keys=("mri", "pet1451", "tabular"))

            # Both imaging towers int8 (quantize_pet=True).
            serve3_qq, _ = quantize_all_modalities_fusion(
                fusion, v3, [dev3], preprocess=preprocess3,
                quantize_pet=True)
            qerr3q = quantization_error(fusion, v3, serve3_qq, dev3_s,
                                        preprocess=preprocess3)
            results["int8_3stage_pet_argmax_agree"] = round(
                qerr3q["argmax_agree"], 4)
            print(f"int8 3-stage (MRI+PET towers) drift vs float: argmax "
                  f"agree {qerr3q['argmax_agree']:.4f}, max prob abs err "
                  f"{qerr3q['prob_max_abs_err']:.4f}", file=sys.stderr)
            _chain_and_time(
                lambda _, bb: serve3_qq(bb), None, dev3,
                "int8 3-stage fusion serve (int8 MRI+PET towers, shared "
                "towers, memoized min-max)", "int8_3stage_pet_vol_s",
                chain_keys=("mri", "pet1451", "tabular"))

        # 3-stage fusion with the int8 MRI backbone fed through the
        # shared-tower hook (quantize_all_modalities_fusion). The fusion
        # benches stay on the parity (dilated) backbone — --fast is a
        # single-model performance-mode demo, so they are skipped there.
        if not args.fast:
            _bench_int8_pet()
            _bench_int8_fusion()

    if args.skip_float or args.fast:
        # --fast scopes the run to the single-model performance mode;
        # the export + parity-fusion surfaces below assume the dilated
        # (reference-parity) backbone.
        print(json.dumps({"metric": "serving", "batch": b,
                          "dilated": not args.fast, **results}))
        return

    # --- Exported StableHLO artifact round-trip. ---
    blob = export_model(model, variables, dev, preprocess=preprocess)
    results["artifact_mb"] = round(len(blob) / 1e6, 1)
    serve = load_exported(blob)

    def drain(out):
        # Real data fetch: cannot complete before every execution queued
        # ahead of it on the device stream has finished.
        return float(np.asarray(out["probs"]).sum())

    drain(serve(dev))  # compile + warm
    # Fetch-only overhead bound: one warm call, then timed fetch.
    out = serve(dev)
    t0 = time.perf_counter()
    drain(out)
    fetch_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = serve(dev)
    drain(out)
    dt = time.perf_counter() - t0
    results["exported_vol_s"] = round(b * args.iters / dt, 1)
    results["exported_fetch_ms"] = round(fetch_s * 1000, 1)
    print(f"Exported artifact ({results['artifact_mb']} MB, reloaded, "
          f"x{args.iters} + drain): {results['exported_vol_s']} vol/s "
          f"(probs-fetch overhead {results['exported_fetch_ms']} ms, "
          f"included once)", file=sys.stderr)

    # --- 3-stage fusion serving: the full production deployment. ---
    # All three towers + three stage-2 heads + the stage-3 classifier,
    # shared frozen towers, memoized MRI bounds, one jit.
    fusion, v3, dev3, preprocess3 = _build_fusion()
    pred3 = Predictor(fusion, v3, batch_size=b, preprocess=preprocess3)
    _chain_and_time(
        pred3._raw_fn, pred3.variables, dev3,
        "3-stage fusion serve (PET+MRI+tabular, shared towers, memoized "
        "min-max)", "three_stage_vol_s",
        chain_keys=("mri", "pet1451", "tabular"))

    # Same deployment with the BN-folded bf16 MRI tower through the
    # external-towers hook (the float analogue of the int8 path).
    from multimodal_alzheimer_tpu.inference.quantize import (
        fold_all_modalities_fusion,
    )

    serve3_f, _ = fold_all_modalities_fusion(fusion, v3,
                                             preprocess=preprocess3)
    _chain_and_time(
        lambda _, bb: serve3_f(bb), None, dev3,
        "3-stage fusion serve, BN-folded MRI tower",
        "three_stage_folded_vol_s",
        chain_keys=("mri", "pet1451", "tabular"))

    if args.host:
        # Full host->host path incl. padding + H2D + D2H. Tunnel-bound
        # on remote-TPU rigs — see module docstring.
        pred.predict_batch(host)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            pred.predict_batch(host)
        dt = time.perf_counter() - t0
        results["predictor_host_vol_s"] = round(b * args.iters / dt, 1)
        print(f"Predictor host->host (padded batch {b}): "
              f"{results['predictor_host_vol_s']} vol/s", file=sys.stderr)

        one = {k: v[:1] for k, v in host.items()}
        pred.predict_batch(one)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            pred.predict_batch(one)
        results["predictor_1vol_latency_ms"] = round(
            (time.perf_counter() - t0) / args.iters * 1000, 1)
        print(f"Predictor single-volume latency (padded to {b}): "
              f"{results['predictor_1vol_latency_ms']} ms",
              file=sys.stderr)

    print(json.dumps({"metric": "serving", "batch": b, **results}))


if __name__ == "__main__":
    main()
