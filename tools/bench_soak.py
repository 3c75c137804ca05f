"""Serving host-memory soak: RSS growth under sustained online load.

VERDICT r4 #5: the axon remote-TPU client retains every H2D host buffer
for process lifetime (CLAUDE.md round-4 measurement: ~1 GB RSS per GB
shipped), so a BatchingServer staging a fresh buffer per request leaks
sample-sized host memory forever — ~36 MB/s at 5 vol/s of 7.2 MB MRI
volumes, OOM on a 125 GB host in hours. ``Predictor(staging_slots=N)``
bounds that by recycling a fixed ring of host staging buffers.

This tool measures both modes: drive a BatchingServer over the flagship
MRI serve at a steady request rate for ``--duration`` seconds, sample
/proc/self/status VmRSS, and report growth per minute + per request.
``--both`` runs plain and pooled in separate subprocesses (RSS
attribution needs a fresh process per mode) and prints one combined
JSON line.

Requests are fresh numpy copies of a rotating set of distinct volumes —
exactly the buffer-per-request pattern a real frontend produces.

Run on the TPU:   python tools/bench_soak.py --both
CPU smoke:        --volume-shape 12 14 12 --depth 10 --duration 5
                  --rate 20 --both
Human lines to stderr; ONE JSON line to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Honor JAX_PLATFORMS even though sitecustomize already imported jax and
# registered the axon plugin (CLAUDE.md: env var alone doesn't stick —
# the live config must be updated too). Subprocesses inherit the env
# var, so --both propagates the platform choice.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms",
                      os.environ["JAX_PLATFORMS"].split(",")[0])


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def run_mode(args) -> dict:
    import jax
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.inference.predictor import Predictor
    from multimodal_alzheimer_tpu.inference.server import BatchingServer
    from multimodal_alzheimer_tpu.models import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        mri_per_scan_zscore,
    )

    shape = tuple(args.volume_shape)
    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": args.depth, "linear_out": (),
         "batchnorm_begin": False, "lr": 1e-3}, dtype=jnp.bfloat16)

    def preprocess(batch):
        out = dict(batch)
        out["mri"] = jax.vmap(mri_per_scan_zscore)(out["mri"],
                                                   out.pop("mri_mask"))
        return out

    rng = np.random.default_rng(0)
    example = {
        "mri": rng.normal(900, 400, (1,) + shape).astype(np.float32),
        "mri_mask": (rng.random((1,) + shape) > 0.35).astype(np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), preprocess(example),
                           train=False)
    slots = 2 * args.rung if args.staging == "pool" else 0
    pred = Predictor(model, variables, batch_size=args.rung,
                     preprocess=preprocess, staging_slots=slots)
    pred.warmup(example, parts=True)

    # rotating set of DISTINCT request payloads, copied fresh per submit
    base = [{
        "mri": rng.normal(900, 400, shape).astype(np.float32),
        "mri_mask": (rng.random(shape) > 0.35).astype(np.float32),
    } for _ in range(8)]
    sample_mb = sum(v.nbytes for v in base[0].values()) / 1e6

    period = 1.0 / args.rate
    served = 0
    inflight: list = []
    with BatchingServer(pred, max_wait_s=args.max_wait) as server:
        rss0 = rss_mb()
        t0 = time.perf_counter()
        t_next = t0
        while (now := time.perf_counter()) - t0 < args.duration:
            if now < t_next:
                time.sleep(min(t_next - now, period))
                continue
            t_next += period
            payload = {k: np.array(v) for k, v in
                       base[served % len(base)].items()}
            # the real server hot path: validate -> stage -> batch
            inflight.append(server.submit(payload))
            served += 1
            if len(inflight) >= 2 * args.rung:  # bound the queue
                for f in inflight:
                    f.result(timeout=300)
                inflight.clear()
        for f in inflight:
            f.result(timeout=300)
        wall = time.perf_counter() - t0
        rss1 = rss_mb()

    grow = rss1 - rss0
    out = {
        "staging": args.staging,
        "requests": served,
        "rate_req_s": round(served / wall, 2),
        "sample_mb": round(sample_mb, 2),
        "rss_start_mb": round(rss0, 1),
        "rss_end_mb": round(rss1, 1),
        "rss_growth_mb": round(grow, 1),
        "rss_growth_mb_per_min": round(grow / (wall / 60), 1),
        "rss_growth_kb_per_req": round(1024 * grow / max(served, 1), 1),
        "pool_fallbacks": (pred.staging_pool.fallbacks
                           if pred.staging_pool else None),
    }
    print(f"soak[{args.staging}]: {served} req at "
          f"{out['rate_req_s']}/s, RSS {rss0:.0f} -> {rss1:.0f} MB "
          f"({out['rss_growth_mb_per_min']} MB/min, "
          f"{out['rss_growth_kb_per_req']} KB/req; sample "
          f"{sample_mb:.1f} MB)", file=sys.stderr)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--volume-shape", type=int, nargs=3,
                        default=(91, 109, 91), metavar=("D", "H", "W"))
    parser.add_argument("--depth", type=int, default=18)
    parser.add_argument("--rung", type=int, default=8,
                        help="compiled batch rung the server dispatches")
    parser.add_argument("--rate", type=float, default=5.0,
                        help="request rate to sustain (req/s)")
    parser.add_argument("--duration", type=float, default=90.0,
                        help="seconds of sustained load per mode")
    parser.add_argument("--max-wait", type=float, default=0.05)
    parser.add_argument("--staging", choices=("plain", "pool"),
                        default="plain")
    parser.add_argument("--both", action="store_true",
                        help="run plain + pool in fresh subprocesses")
    args = parser.parse_args(argv)

    if args.both:
        results = {}
        base_cmd = [sys.executable, os.path.abspath(__file__),
                    "--volume-shape", *map(str, args.volume_shape),
                    "--depth", str(args.depth), "--rung", str(args.rung),
                    "--rate", str(args.rate),
                    "--duration", str(args.duration),
                    "--max-wait", str(args.max_wait)]
        for mode in ("plain", "pool"):
            proc = subprocess.run(base_cmd + ["--staging", mode],
                                  capture_output=True, text=True)
            sys.stderr.write(proc.stderr)
            if proc.returncode != 0:
                raise RuntimeError(f"soak {mode} failed: "
                                   f"{proc.stderr[-2000:]}")
            results[mode] = json.loads(
                proc.stdout.strip().splitlines()[-1])
        saved = (results["plain"]["rss_growth_mb_per_min"]
                 - results["pool"]["rss_growth_mb_per_min"])
        print(f"verdict: pool saves {saved:.1f} MB/min of RSS growth at "
              f"{args.rate} req/s x {results['plain']['sample_mb']} MB",
              file=sys.stderr)
        print(json.dumps({"metric": "serving_soak_rss",
                          "volume_shape": list(args.volume_shape),
                          "depth": args.depth, "rate_req_s": args.rate,
                          "duration_s": args.duration, **results}))
        return

    out = run_mode(args)
    print(json.dumps({"metric": "serving_soak_rss", **out}))


if __name__ == "__main__":
    main()
