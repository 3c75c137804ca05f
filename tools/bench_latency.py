"""Serving latency benchmark: batch-size ladder SLOs on the real chip.

Measures the latency story VERDICT r3 flagged as missing — the reference
has no serving layer at all, so these are this repo's own production
claims (inference/predictor.py + inference/server.py):

1. **Device rung ladder** — scan-chained device time of the compiled
   serve step at each ladder rung (default 8/32/128) for the BN-folded
   bf16 and int8 PTQ cores on the flagship AnatCNN (91x109x91, memoized
   quantile min-max). This is the latency *floor* a request pays once
   its batch launches, and quantifies what the ladder buys: a lone
   request runs the 8-wide program, not the 128-wide one.
2. **End-to-end SLOs** — open-loop Poisson arrivals submitted to
   ``BatchingServer`` (single samples, host-resident), per-request
   submit->result latency measured around the real D2H fetch inside
   ``predict_batch``. Reports p50/p95/p99 latency + achieved throughput
   per offered load, plus the dispatched-batch histogram. A control run
   without the ladder shows the tiering benefit at low load.

Methodology notes (CLAUDE.md): ``block_until_ready`` under-waits through
the axon tunnel, so rung times come from a scan-chained loop timed
around a scalar fetch, and e2e latencies are honest because
``predict_batch`` fetches results to host (a real D2H drain). Host-side
caveats measured, not assumed: this rig has 1 CPU core and repeated
large H2D transfers through the tunnel degrade within a process —
e2e numbers here bound what THIS host can feed, while the rung table is
pure device time. Run ``tools/bench_host.py`` alongside to anchor the
host's memcpy bandwidth next to the e2e numbers.

Run: python tools/bench_latency.py [--rungs 8,32,128] [--loads 2,8,32]
     [--seconds 20] [--skip-e2e | --skip-rungs] [--no-int8]
Prints one human line per measurement to stderr, one JSON line to
stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOLUME_SHAPE = (91, 109, 91)  # overridden by --volume-shape


def _build_cores(args):
    """Flagship model + (folded bf16, int8) serve fns with memoized
    min-max preprocessing fused in. Returns (cores, preprocess, dev)."""
    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.inference.quantize import (
        fold_anat_cnn,
        quantize_anat_cnn,
    )
    from multimodal_alzheimer_tpu.models import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )
    from multimodal_alzheimer_tpu.ops.pallas_norm import (
        batched_masked_quantiles,
    )

    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": args.depth, "linear_out": (),
         "batchnorm_begin": False, "lr": 1e-3}, dtype=jnp.bfloat16)

    def preprocess(batch):
        out = dict(batch)
        out["mri"] = batched_normalize_mri(
            out["mri"], out.pop("mri_mask"),
            {"per_scan_norm": "min_max"}, 0.99,
            qminmax=out.pop("mri_qminmax"))
        return out

    rng = np.random.default_rng(0)
    b = max(args.rungs)
    shape = tuple(args.volume_shape)
    host = {
        "mri": rng.normal(900, 400, (b,) + shape).astype(np.float32),
        "mri_mask": (rng.random((b,) + shape) > 0.35).astype(np.float32),
    }
    dev = {k: jnp.asarray(v) for k, v in host.items()}
    # interpret=True only off-TPU (CPU smoke runs); the Pallas
    # radix-select kernel is TPU-only.
    interp = jax.devices()[0].platform != "tpu"
    dev["mri_qminmax"] = batched_masked_quantiles(
        dev["mri"], dev["mri_mask"], (0.01, 0.99), interpret=interp)
    host["mri_qminmax"] = np.asarray(dev["mri_qminmax"])

    variables = model.init(jax.random.PRNGKey(0), preprocess(dev),
                           train=False)
    serve_folded, _ = fold_anat_cnn(model, variables,
                                    preprocess=preprocess)
    cores = {"folded_bf16": serve_folded}
    if not args.no_int8:
        serve_int8, _ = quantize_anat_cnn(model, variables, [dev],
                                          preprocess=preprocess)
        cores["int8"] = serve_int8
    return cores, dev, host


def _rung_device_times(cores, dev, rungs, iters, results):
    """Scan-chained device ms/batch per (core, rung)."""
    import jax
    import jax.numpy as jnp

    for name, serve in cores.items():
        for rung in rungs:
            batch = {k: v[:rung] for k, v in dev.items()}

            @jax.jit
            def chained(batch, tag0, _serve=serve):
                def body(tag, _):
                    bb = dict(batch)
                    bb["mri"] = batch["mri"] + tag
                    out = _serve(bb)
                    return (out["probs"].astype(jnp.float32).sum()
                            * 1e-20), ()
                tag, _ = jax.lax.scan(body, tag0, None, length=iters)
                return tag

            tag0 = jnp.float32(0.0)
            float(chained(batch, tag0))  # compile + warm
            t0 = time.perf_counter()
            tag = float(chained(batch, tag0))
            dt = time.perf_counter() - t0
            assert np.isfinite(tag)
            ms = dt / iters * 1000
            key = f"rung_{name}_b{rung}"
            results[key + "_ms"] = round(ms, 2)
            results[key + "_vol_s"] = round(rung * iters / dt, 1)
            print(f"rung {name} b={rung}: {ms:.2f} ms/batch "
                  f"({rung * iters / dt:.1f} vol/s)", file=sys.stderr)


def _one_sample(host, i):
    n = len(host["mri"])
    return {k: v[i % n] for k, v in host.items()}


def _run_load(pred, load, seconds, max_wait_s, results, tag, warm_host):
    """Open-loop Poisson arrivals at ``load`` req/s for ``seconds``.

    ``pred`` is a prebuilt, warmed Predictor (reused across load points
    so each point pays zero compiles)."""
    from multimodal_alzheimer_tpu.inference.server import BatchingServer

    lat, lock = [], threading.Lock()
    rng = np.random.default_rng(1)
    with BatchingServer(pred, max_wait_s=max_wait_s) as server:
        deadline = time.monotonic() + seconds
        futures = []
        i = 0
        while time.monotonic() < deadline:
            t_submit = time.perf_counter()
            fut = server.submit(_one_sample(warm_host, i))
            i += 1

            def done(f, t0=t_submit):
                if f.exception() is None:
                    with lock:
                        lat.append(time.perf_counter() - t0)
            fut.add_done_callback(done)
            futures.append(fut)
            # open loop: exponential inter-arrival, never waits on results
            time.sleep(float(rng.exponential(1.0 / load)))
        for f in futures:
            f.result(timeout=600)
        hist = dict(sorted(server.batch_histogram.items()))
    lat_ms = np.sort(np.asarray(lat)) * 1000
    out = {
        "offered_load": load,
        "requests": len(lat_ms),
        "achieved_vol_s": round(len(lat_ms) / seconds, 1),
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 1),
        "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        "batch_histogram": hist,
    }
    results.setdefault(tag, []).append(out)
    print(f"e2e {tag} load={load}/s: p50 {out['p50_ms']} ms, "
          f"p95 {out['p95_ms']} ms, p99 {out['p99_ms']} ms, achieved "
          f"{out['achieved_vol_s']} vol/s, batches {hist}",
          file=sys.stderr)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--rungs", default="8,32,128",
                        help="comma-separated compiled batch sizes")
    parser.add_argument("--loads", default="2,8,32",
                        help="offered loads (req/s) for the e2e phase")
    parser.add_argument("--seconds", type=float, default=20.0,
                        help="duration per e2e load point")
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--max-wait-ms", type=float, default=5.0)
    parser.add_argument("--skip-e2e", action="store_true")
    parser.add_argument("--skip-rungs", action="store_true")
    parser.add_argument("--no-int8", action="store_true")
    parser.add_argument("--volume-shape", type=int, nargs=3,
                        default=VOLUME_SHAPE, metavar=("D", "H", "W"),
                        help="smoke-testing knob; default = flagship")
    parser.add_argument("--depth", type=int, default=18,
                        help="ResNet depth (smoke-testing knob)")
    args = parser.parse_args(argv)
    args.rungs = sorted(int(r) for r in args.rungs.split(","))
    loads = [float(x) for x in args.loads.split(",")]

    results: dict = {"rungs": args.rungs}
    cores, dev, host = _build_cores(args)

    if not args.skip_rungs:
        _rung_device_times(cores, dev, args.rungs, args.iters, results)

    if not args.skip_e2e:
        from multimodal_alzheimer_tpu.inference.predictor import Predictor

        top = max(args.rungs)
        ladder = tuple(r for r in args.rungs if r < top)
        warm = {k: v[:1] for k, v in host.items()}
        for name, serve in cores.items():
            pred = Predictor(None, None, batch_size=top, serve_fn=serve,
                             ladder=ladder)
            pred.warmup(warm, parts=True)
            for load in loads:
                _run_load(pred, load, args.seconds,
                          args.max_wait_ms / 1000, results,
                          f"{name}_ladder", host)
            # control: no ladder — every deadline batch pads to the top
            # rung, showing what tiering buys at low load
            pred_flat = Predictor(None, None, batch_size=top,
                                  serve_fn=serve)
            pred_flat.warmup(warm, parts=True)
            _run_load(pred_flat, loads[0], args.seconds,
                      args.max_wait_ms / 1000, results,
                      f"{name}_noladder", host)

    print(json.dumps({"metric": "serving_latency", **results}))


if __name__ == "__main__":
    main()
