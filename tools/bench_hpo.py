"""Vectorized-HPO benchmark: vmapped K-trial training vs sequential trials.

The reference's HPO is 300 sequential optuna fits
(reference: train_pet_cnn.py:208-216); the tabular branch's trials are
tiny MLPs whose per-step matmuls can't feed the MXU. train/vmap_hpo.py
stacks K trials into one program — this tool measures what that buys on
the real chip.

Workload: ADNI-scale synthetic tabular data (the real train split is
~1.5k rows of 9 features), reference-width MLP (hidden 256->1024),
identical epoch budgets, early stopping disabled so both paths do exactly
the same optimizer/epoch work. Sequential = K width-1 calls of the SAME
vmapped trainer (so the comparison isolates the trial-batching win, not
Trainer-vs-scan implementation differences); each width-1 call re-traces,
exactly like each sequential optuna trial builds a fresh Trainer.

Timing: whole-call wall time including the per-epoch host sync (the val
loss is fetched every epoch — a real scalar fetch, so the axon tunnel's
under-waiting block_until_ready issue does not apply). Both paths are
measured on their second run (first warms the jit/persistent cache) and
both timed runs retrace identically, so trace cost is represented the
same way in both numbers.

Prints human lines to stderr, one JSON line to stdout.
Run: ``python tools/bench_hpo.py [--k 16] [--epochs 10] [--n 1536]``.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

try:
    with open("/proc/cpuinfo") as _f:
        _cpu_flags = next((ln for ln in _f if ln.startswith("flags")), "")
except OSError:
    _cpu_flags = ""
_platform = os.environ.get("JAX_PLATFORMS", "axon").split(",")[0] or "axon"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    f"/tmp/jax_cache-{hashlib.md5(_cpu_flags.encode()).hexdigest()[:8]}"
    f"-{_platform}")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from multimodal_alzheimer_tpu.models.tabular_models.tabular_mlp import (  # noqa: E402
    TabularMLP,
)
from multimodal_alzheimer_tpu.train import vmap_hpo  # noqa: E402


def _data(n, seed, rule_seed=42):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 9)).astype(np.float32)
    w = np.random.default_rng(rule_seed).normal(size=(9, 3))
    y = (x @ w + 0.5 * rng.normal(size=(n, 3))).argmax(1).astype(np.int32)
    return {"tabular": x, "label": y}


def _trial_rows(k, seed=0):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(k):
        gamma = rng.choice([None, 1, 2, 5])
        rows.append({
            "lr": float(10 ** rng.uniform(-5, -2)),
            "l2_reg": float(rng.choice([0, 1e-1, 1e-2, 1e-3])),
            "dropout_p": float(rng.uniform(0, 0.5)),
            "fl_gamma": None if gamma is None else float(gamma),
            "trial_seed": i,
        })
    return rows


def _fusion_bench(args):
    """Stage-2 frozen-fusion HPO: K shared-tower trials vs sequential.

    Workload: PET(8-16-32-64 CNN) + MRI(ResNet-18) towers at the full
    91x109x91 resolution feeding K vmapped fusion heads
    (train/fusion_hpo.py). Sequential baseline = K width-1 calls of the
    SAME shared-tower trainer — each sequential trial pays one tower
    forward per step, exactly like a sequential optuna fit, so the
    speedup isolates how far the tower cost amortizes over the trial
    axis. Volumes are pre-normalized synthetics (the production
    preprocessing is a memoized elementwise apply — negligible).
    """
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion \
        import AnatPETFusion
    from multimodal_alzheimer_tpu.models.mri_models.anat_cnn import AnatCNN
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )
    from multimodal_alzheimer_tpu.train import fusion_hpo

    pet_hp = {"n_classes": 3, "conv_out": (8, 16, 32, 64),
              "filter_size": (5, 5, 3, 3), "linear_out": 64}
    mri_hp = {"n_classes": 3, "resnet_depth": 18}
    shape = (91, 109, 91)
    rng = np.random.default_rng(0)

    def vol_data(n, seed):
        r = np.random.default_rng(seed)
        return {
            "pet1451": (r.normal(size=(n,) + shape) * 0.5 + 0.5)
            .astype(np.float32),
            "mri": r.normal(size=(n,) + shape).astype(np.float32),
            "label": r.integers(0, 3, n).astype(np.int32),
        }

    train_data = vol_data(args.n, 10)
    val_data = vol_data(max(args.batch, args.n // 4), 11)
    del rng

    pet_model = SmallPETCNN.from_hparams(pet_hp)
    mri_model = AnatCNN.from_hparams(mri_hp)
    example = {k: jnp.asarray(v[:2]) for k, v in train_data.items()}
    tower_models = {"pet": pet_model, "mri": mri_model}
    tower_vars = {
        "pet": pet_model.init(jax.random.PRNGKey(1), example, train=False),
        "mri": mri_model.init(jax.random.PRNGKey(2), example, train=False),
    }
    head = AnatPETFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": None}, pet_hp, mri_hp)
    rows = _trial_rows(args.k)
    for row in rows:
        row.pop("dropout_p")  # stage-2 space has no dropout knob
    cw = np.array([0.55, 0.75, 0.7], np.float32)

    def run(row_subset):
        hp = vmap_hpo.stack_trial_hparams(row_subset)
        return fusion_hpo.run_frozen_fusion_trials(
            head, tower_models, tower_vars, hp, train_data, val_data,
            batch_size=args.batch, max_epochs=args.epochs,
            patience=10 ** 9, class_weights=cw, seed=5)

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    t_vmap = timed(lambda: run(rows))
    t_seq = timed(lambda: [run([row]) for row in rows])

    vmap_tps, seq_tps = args.k / t_vmap, args.k / t_seq
    speedup = t_seq / t_vmap
    print(f"fusion vmapped width-{args.k}: {t_vmap:.2f}s = "
          f"{vmap_tps:.3f} trials/s ({args.epochs} epochs, n={args.n}, "
          f"b={args.batch}, 91^3 towers)", file=sys.stderr)
    print(f"fusion sequential width-1 x{args.k}: {t_seq:.2f}s = "
          f"{seq_tps:.3f} trials/s", file=sys.stderr)
    print(f"speedup: {speedup:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": "fusion_hpo_trials_per_s_shared_towers",
        "value": round(vmap_tps, 4),
        "unit": "trials/s",
        "k": args.k,
        "epochs": args.epochs,
        "sequential_trials_per_s": round(seq_tps, 4),
        "speedup_vs_sequential": round(speedup, 2),
        "device": jax.devices()[0].device_kind,
    }))


def _stage3_bench(args):
    """Stage-3 frozen HPO: K vmapped stage3out/cls3 heads over ONE shared
    pass through all three frozen stage-2 sub-models (stage-1 towers
    computed once, the share_towers dataflow) vs sequential width-1. The
    per-trial state is ~13k params, so the K-trial search should cost
    barely more than one trial's tower compute — this measures how true
    that is end-to-end.
    """
    import jax.numpy as jnp

    from multimodal_alzheimer_tpu.models.fusion_models.all_modalities_fusion \
        import AllModalitiesFusion
    from multimodal_alzheimer_tpu.models.fusion_models.anat_pet_fusion \
        import AnatPETFusion
    from multimodal_alzheimer_tpu.models.fusion_models.pet_tabular_fusion \
        import PETTabularFusion
    from multimodal_alzheimer_tpu.models.fusion_models.tabular_mri_fusion \
        import TabularMRIFusion
    from multimodal_alzheimer_tpu.train import fusion_hpo

    pet_hp = {"n_classes": 3, "conv_out": (8, 16, 32, 64),
              "filter_size": (5, 5, 3, 3), "linear_out": 64}
    mri_hp = {"n_classes": 3, "resnet_depth": 18}
    tab_hp = {"n_classes": 3, "hidden": (256, 1024)}
    hp2 = {"n_classes": 3, "lr_pretrained": None, "simple_dim_red": False}
    shape = (91, 109, 91)

    def vol_data(n, seed):
        r = np.random.default_rng(seed)
        return {
            "pet1451": (r.normal(size=(n,) + shape) * 0.5 + 0.5)
            .astype(np.float32),
            "mri": r.normal(size=(n,) + shape).astype(np.float32),
            "tabular": r.normal(size=(n, 9)).astype(np.float32),
            "label": r.integers(0, 3, n).astype(np.int32),
        }

    train_data = vol_data(args.n, 10)
    val_data = vol_data(max(args.batch, args.n // 4), 11)

    sub_models = {
        "anat_pet": AnatPETFusion.from_hparams(hp2, pet_hp, mri_hp),
        "anat_tab": TabularMRIFusion.from_hparams(hp2, mri_hp, tab_hp),
        "pet_tab": PETTabularFusion.from_hparams(hp2, pet_hp, tab_hp),
    }
    example = {k: jnp.asarray(v[:2]) for k, v in train_data.items()}
    sub_variables = {
        n: m.init(jax.random.PRNGKey(40 + i), example, train=False)
        for i, (n, m) in enumerate(sub_models.items())
    }
    head = AllModalitiesFusion.from_hparams(
        {"n_classes": 3, "lr_pretrained": None}, hp2, hp2, hp2,
        pet_hp, mri_hp, tab_hp)
    rows = _trial_rows(args.k)
    for row in rows:
        row.pop("dropout_p")  # stage-3 space has no dropout knob
    cw = np.array([0.55, 0.75, 0.7], np.float32)

    shared_fn, carry0 = fusion_hpo.make_stage3_shared_fn(sub_models,
                                                         sub_variables)

    def run(row_subset):
        hp = vmap_hpo.stack_trial_hparams(row_subset)
        return fusion_hpo.run_shared_trials(
            head, shared_fn, carry0, hp, train_data, val_data,
            hook_kwarg="fusion_inputs", batch_size=args.batch,
            max_epochs=args.epochs, patience=10 ** 9, class_weights=cw,
            seed=5)

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    t_vmap = timed(lambda: run(rows))
    t_seq = timed(lambda: [run([row]) for row in rows])

    vmap_tps, seq_tps = args.k / t_vmap, args.k / t_seq
    speedup = t_seq / t_vmap
    print(f"stage-3 vmapped width-{args.k}: {t_vmap:.2f}s = "
          f"{vmap_tps:.3f} trials/s ({args.epochs} epochs, n={args.n}, "
          f"b={args.batch}, 91^3 towers x3 sub-models)", file=sys.stderr)
    print(f"stage-3 sequential width-1 x{args.k}: {t_seq:.2f}s = "
          f"{seq_tps:.3f} trials/s", file=sys.stderr)
    print(f"speedup: {speedup:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": "stage3_hpo_trials_per_s_shared_submodels",
        "value": round(vmap_tps, 4),
        "unit": "trials/s",
        "k": args.k,
        "epochs": args.epochs,
        "sequential_trials_per_s": round(seq_tps, 4),
        "speedup_vs_sequential": round(speedup, 2),
        "device": jax.devices()[0].device_kind,
    }))


def _pet_bench(args):
    """Stage-1 PET CNN HPO: K full-model trials in one vmapped program.

    Unlike the fusion modes there is nothing trial-invariant to share —
    every trial trains its whole conv ladder — so the win here is pure
    arithmetic-intensity batching: K per-trial (B, 91^3) conv steps fuse
    into one K-fold-wider program. Traced per-trial knobs: lr, focal
    gamma, both dropout rates (train_pet_cnn.optuna_optimization
    parallel=K path).
    """
    from multimodal_alzheimer_tpu.models.pet_models.pet_cnn import (
        SmallPETCNN,
    )

    shape = (91, 109, 91)
    model = SmallPETCNN(n_classes=3, conv_out=(8, 16, 32, 64),
                        filter_size=(5, 5, 3, 3), linear_out=64)

    def vol_data(n, seed):
        r = np.random.default_rng(seed)
        return {
            "pet1451": (r.normal(size=(n,) + shape) * 0.5 + 0.5)
            .astype(np.float32),
            "label": r.integers(0, 3, n).astype(np.int32),
        }

    train_data = vol_data(args.n, 10)
    val_data = vol_data(max(args.batch, args.n // 4), 11)
    rows = _trial_rows(args.k)
    for row in rows:
        row["dropout_conv_p"] = 0.1
        row["dropout_dense_p"] = row.pop("dropout_p")
    cw = np.array([0.55, 0.75, 0.7], np.float32)

    def apply_fn(model, variables, batch, hp, rng, train):
        if train:
            return model.apply(variables, batch, train=True,
                               rngs={"dropout": rng},
                               mutable=["batch_stats"],
                               dropout_conv_rate=hp["dropout_conv_p"],
                               dropout_dense_rate=hp["dropout_dense_p"])
        return model.apply(variables, batch, train=False), {}

    def run(row_subset):
        hp = vmap_hpo.stack_trial_hparams(
            row_subset, extra_keys=("dropout_conv_p", "dropout_dense_p"))
        return vmap_hpo.run_parallel_trials(
            model, hp, train_data, val_data, batch_size=args.batch,
            max_epochs=args.epochs, patience=10 ** 9, class_weights=cw,
            seed=5, apply_fn=apply_fn)

    def timed(fn):
        fn()
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    t_vmap = timed(lambda: run(rows))
    t_seq = timed(lambda: [run([row]) for row in rows])

    vmap_tps, seq_tps = args.k / t_vmap, args.k / t_seq
    speedup = t_seq / t_vmap
    print(f"pet vmapped width-{args.k}: {t_vmap:.2f}s = "
          f"{vmap_tps:.3f} trials/s ({args.epochs} epochs, n={args.n}, "
          f"b={args.batch}, 91^3 full-model trials)", file=sys.stderr)
    print(f"pet sequential width-1 x{args.k}: {t_seq:.2f}s = "
          f"{seq_tps:.3f} trials/s", file=sys.stderr)
    print(f"speedup: {speedup:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": "pet_hpo_trials_per_s_vmapped",
        "value": round(vmap_tps, 4),
        "unit": "trials/s",
        "k": args.k,
        "epochs": args.epochs,
        "sequential_trials_per_s": round(seq_tps, 4),
        "speedup_vs_sequential": round(speedup, 2),
        "device": jax.devices()[0].device_kind,
    }))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--k", type=int, default=16)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--n", type=int, default=1536)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--fusion", action="store_true",
                        help="stage-2 frozen-fusion shared-tower workload "
                             "(use --n 192 --batch 32 --epochs 3 scale)")
    parser.add_argument("--stage3", action="store_true",
                        help="stage-3 frozen HPO workload (shared stage-2 "
                             "sub-model pass + K vmapped stage-3 heads)")
    parser.add_argument("--pet", action="store_true",
                        help="stage-1 PET CNN full-model trial batching "
                             "(use --k 4 --n 192 --batch 16 --epochs 3)")
    args = parser.parse_args()
    if args.fusion:
        _fusion_bench(args)
        return
    if args.stage3:
        _stage3_bench(args)
        return
    if args.pet:
        _pet_bench(args)
        return

    model = TabularMLP(n_classes=3, hidden=(256, 1024))
    train_data = _data(args.n, 0)
    val_data = _data(args.n // 3, 1)
    rows = _trial_rows(args.k)
    cw = np.array([0.55, 0.75, 0.7], np.float32)

    def run(row_subset):
        hp = vmap_hpo.stack_trial_hparams(row_subset)
        return vmap_hpo.run_parallel_trials(
            model, hp, train_data, val_data, batch_size=args.batch,
            max_epochs=args.epochs, patience=10 ** 9, class_weights=cw,
            seed=5)

    def timed(fn):
        fn()  # warm: jit + persistent cache
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    t_vmap = timed(lambda: run(rows))

    def sequential():
        for row in rows:
            run([row])

    t_seq = timed(sequential)

    vmap_tps = args.k / t_vmap
    seq_tps = args.k / t_seq
    speedup = t_seq / t_vmap
    print(f"vmapped width-{args.k}: {t_vmap:.2f}s = {vmap_tps:.2f} trials/s"
          f" ({args.epochs} epochs, n={args.n}, b={args.batch})",
          file=sys.stderr)
    print(f"sequential width-1 x{args.k}: {t_seq:.2f}s = "
          f"{seq_tps:.2f} trials/s", file=sys.stderr)
    print(f"speedup: {speedup:.1f}x", file=sys.stderr)
    print(json.dumps({
        "metric": "hpo_trials_per_s_vmapped",
        "value": round(vmap_tps, 3),
        "unit": "trials/s",
        "k": args.k,
        "epochs": args.epochs,
        "sequential_trials_per_s": round(seq_tps, 3),
        "speedup_vs_sequential": round(speedup, 2),
        "device": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
