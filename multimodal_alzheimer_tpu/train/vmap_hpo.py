"""Vectorized hyperparameter search: K trials per jitted step via vmap.

The reference's HPO is strictly sequential: optuna's TPE proposes one
config, one Lightning fit runs to completion, repeat 300 times
(reference: train_pet_cnn.py:208-216). For the small models that is a
terrible fit for a TPU — one tabular-MLP trial's (B,256)x(256,1024)
matmuls leave the MXU idle and the step time is pure dispatch latency.

This module runs K trials *simultaneously* as one XLA program:
``jax.vmap`` over a stacked-trial axis turns K tiny training steps into
K-fold-bigger matmuls (the shape regime the MXU wants), and a host-side
batched-TPE driver keeps proposing/collecting K configs at a time.

Design:

* **Traced per-trial hparams** — lr, torch-style l2, dropout rate, focal
  gamma / loss selector, init seed — are stacked into (K,) arrays and
  vmapped. The loss and optimizer are written with these as runtime
  values: l2 is added to the gradients *before* the Adam moments and the
  update is scaled by ``-lr``, exactly ``optim.adam_group``'s chain
  (torch ``Adam(lr, weight_decay)`` semantics).
* **Static per-bucket hparams** — architecture (hidden widths), batch
  size, epoch budget — define a *bucket signature*. ``optimize_batched``
  groups each ask-round's proposals by signature and pads every bucket to
  a fixed vmap width, so XLA compiles one program per signature, ever.
* **Per-trial early stopping** — an ``active`` mask freezes a stopped
  trial's whole carry (params, opt state, batch stats) with ``jnp.where``;
  the stop rule replays ``train/optim.py:EarlyStopping`` exactly (stop
  after ``patience`` consecutive non-improving epochs, min_delta 0).
* **Objective parity** — the per-trial validation loss is the Lightning
  unweighted mean over val batches (loop.py:262-265), each batch scored
  with the reference's weighted-CE / focal semantics
  (losses/classification.py), and the returned value is the val loss at
  each trial's stopping epoch — the same number the sequential
  ``Trainer.fit`` hands optuna.

Divergences from the sequential path (inherent to batching, documented):
trials in one bucket share the per-epoch shuffle order (each sequential
trial would draw its own), and the train epoch drops the ragged tail
batch (static shapes under ``lax.scan``). Both are statistically neutral
for a *search*; the winning config is refit with the normal ``train()``
entry point for checkpoints.
"""

from __future__ import annotations

import math
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

TRACED_KEYS = ("lr", "l2_reg", "dropout_p", "fl_gamma")


def stack_trial_hparams(rows: Sequence[dict], pad_to: Optional[int] = None,
                        seed_offset: int = 0,
                        extra_keys: Sequence[str] = ()) -> dict:
    """Stack per-trial hparam dicts into (K,) traced arrays.

    ``fl_gamma`` None/0 selects weighted CE (``use_focal`` 0); truthy
    selects the reference's FocalLoss with that gamma — mirroring
    ``losses.make_criterion``. ``pad_to`` repeats the last row so every
    bucket compiles at one fixed width; padded rows are trained but their
    results are discarded by the caller (slice ``[:len(rows)]``).
    ``extra_keys`` stacks additional model-family-specific traced floats
    (e.g. the PET CNN's two dropout rates); absent/None values become 0.0.
    """
    rows = list(rows)
    n_real = len(rows)
    if pad_to is not None:
        if n_real > pad_to:
            raise ValueError(f"{n_real} rows > pad_to={pad_to}")
        rows = rows + [rows[-1]] * (pad_to - n_real)

    def farr(key):
        return jnp.asarray([float(r.get(key) or 0.0) for r in rows],
                           jnp.float32)

    hp = {
        "lr": farr("lr"),
        "l2_reg": farr("l2_reg"),
        "dropout_p": farr("dropout_p"),
        "fl_gamma": farr("fl_gamma"),
        "use_focal": jnp.asarray(
            [1.0 if r.get("fl_gamma") else 0.0 for r in rows], jnp.float32),
        "trial_seed": jnp.asarray(
            [int(r.get("trial_seed", seed_offset + i))
             for i, r in enumerate(rows)], jnp.int32),
    }
    for key in extra_keys:
        hp[key] = farr(key)
    return hp


def trial_criterion(logits, labels, mask, hp, class_weights):
    """Per-trial loss with traced selector/gamma.

    ``use_focal`` 0: torch weighted CE — sum(w[y]*nll)/sum(w[y])
    (losses/classification.py:37-59). 1: reference FocalLoss,
    mean((1-pt)^gamma * nll) with pt detached
    (losses/classification.py:62-83; the reference passes no alpha).
    ``mask`` zeroes padded samples; gamma only ever multiplies a
    stop-gradient factor so a traced value costs nothing.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    w = jnp.asarray(class_weights, jnp.float32)[labels] * mask
    wce = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-12)
    pt = jax.lax.stop_gradient(jnp.exp(-nll))
    focal = (jnp.sum((1.0 - pt) ** hp["fl_gamma"] * nll * mask)
             / jnp.maximum(jnp.sum(mask), 1.0))
    return jnp.where(hp["use_focal"] > 0, focal, wce)


def _default_apply(model, variables, batch, hp, rng, train):
    """Apply hook: forwards the traced dropout rate to models that take it
    (TabularMLP's ``dropout_rate`` call arg). Override ``apply_fn`` for
    model families with different traced knobs."""
    if train:
        return model.apply(variables, batch, train=True,
                           rngs={"dropout": rng},
                           mutable=["batch_stats"],
                           dropout_rate=hp["dropout_p"])
    return model.apply(variables, batch, train=False), {}


def run_parallel_trials(model, hp: dict, train_data: dict, val_data: dict, *,
                        batch_size: int, max_epochs: int, patience: int,
                        class_weights, seed: int = 5,
                        apply_fn: Callable = _default_apply,
                        return_state: bool = False, mesh=None,
                        shared_fn: Optional[Callable] = None,
                        shared_carry0=None,
                        init_fn: Optional[Callable] = None,
                        lr_select: Optional[Callable] = None,
                        track_best: bool = False):
    """Train K = hp['lr'].shape[0] trials of ``model`` in one vmapped loop.

    ``train_data``/``val_data``: dicts of stacked host/device arrays with a
    leading sample axis, including ``'label'`` (int). All trials see the
    same data (HPO over one split) but have independent init seeds,
    dropout streams, and traced hparams.

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — *trial parallelism*:
    the stacked trial axis is sharded over the mesh's first axis (K must
    divide by its size; use ``stack_trial_hparams(pad_to=...)``). Each
    trial lives whole on one device and the data is replicated, so GSPMD
    partitions the program with zero collectives — HPO throughput scales
    linearly with chips on top of the vmap win. (The reference's
    single-GPU sequential search has no analogue; SURVEY.md §2.6.)

    ``shared_fn``: optional *trial-invariant* computation hoisted out of
    the vmap — ``shared_fn(shared_carry, batch, train) -> (out, carry)``
    runs ONCE per step (unbatched over trials) and its output is handed
    to ``apply_fn`` as a 7th argument. This is the frozen-fusion HPO fast
    path: the frozen stage-1/2 towers' forward depends only on the batch
    (never on a trial's head params; the reference's fusion regimes run
    towers dropout-free — all_modalities_fusion.py:50), so K head trials
    share one tower forward per step. The carry holds whatever evolves
    input-only (tower BN batch_stats); in eval the carry is read, not
    advanced. Exactness vs per-trial towers: tower BN stats update from
    inputs alone, so every trial's private stats tree would stay
    identical anyway (tests/test_vmap_hpo.py pins this).

    Returns ``(last_val_losses (K,), info)`` where ``last_val_losses[i]``
    is trial i's val loss at its early-stopping epoch, and ``info`` has
    ``val_history`` (epochs, K), ``stopped_epoch`` (K,), and optionally
    the final stacked carry (``return_state``).

    ``track_best``: additionally snapshot each trial's (params,
    batch_stats) at its best-val-loss epoch — one ``jnp.where`` select
    per epoch, K extra param copies in HBM — and return them as
    ``info['best_carry']`` (+ ``info['best_val']``). This is what a
    *deployment* wants out of a short fit: the ES-stopped final carry
    sits ``patience`` non-improving epochs past the best state, and
    quick high-lr fits can collapse in exactly that window (the round-4
    fast-mode study scored final states and misread collapsed carries
    as convergence failures — ADVICE r4 #1).
    """
    train_data = {k: jnp.asarray(v) for k, v in train_data.items()}
    val_data = {k: jnp.asarray(v) for k, v in val_data.items()}
    n_train = int(train_data["label"].shape[0])
    n_val = int(val_data["label"].shape[0])
    b = int(min(batch_size, n_train))
    n_batches = n_train // b
    k_trials = int(hp["lr"].shape[0])
    class_weights = jnp.asarray(class_weights, jnp.float32)

    # Val batches: pad with wrapped indices, mask the pads; loss per batch
    # on real samples only, epoch val loss = unweighted mean over batches
    # (Lightning parity, loop.py:262-265).
    n_vb = max(1, math.ceil(n_val / b))
    val_idx = jnp.asarray(np.arange(n_vb * b) % n_val,
                          jnp.int32).reshape(n_vb, b)
    val_mask = jnp.asarray(
        (np.arange(n_vb * b) < n_val).astype(np.float32)).reshape(n_vb, b)

    example = {k: v[:b] for k, v in train_data.items()}
    root = jax.random.PRNGKey(seed)
    trial_keys = jax.vmap(lambda s: jax.random.fold_in(root, s))(
        hp["trial_seed"])

    # ``init_fn(model, key, example, shared_example) -> variables`` lets the
    # shared-tower path init ONLY the head (e.g. flax models whose tower
    # submodules are skipped when a ``towers=`` kwarg is supplied), so the
    # per-trial carry never stacks K copies of frozen tower params.
    shared_example = None
    if shared_fn is not None:
        shared_example, _ = jax.jit(shared_fn, static_argnums=2)(
            shared_carry0 if shared_carry0 is not None else (),
            example, False)

    def init_one(key):
        if init_fn is not None:
            return init_fn(model, key, example, shared_example)
        return model.init(key, example, train=False)

    variables = jax.jit(jax.vmap(init_one))(trial_keys)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt_state = jax.jit(jax.vmap(adam.init))(params)
    carry0 = (params, batch_stats, opt_state)

    trial_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.axis_names[0]
        if k_trials % mesh.devices.size:
            raise ValueError(
                f"K={k_trials} trials must divide the {mesh.devices.size}-"
                f"device mesh (pad with stack_trial_hparams(pad_to=...))")
        trial_sharding = NamedSharding(mesh, PartitionSpec(axis))
        replicated = NamedSharding(mesh, PartitionSpec())
        # trial axis sharded; data/batch indices replicated
        carry0 = jax.device_put(carry0, trial_sharding)
        hp = jax.device_put(hp, trial_sharding)
        trial_keys = jax.device_put(trial_keys, trial_sharding)
        train_data = jax.device_put(train_data, replicated)
        val_data = jax.device_put(val_data, replicated)
        val_idx = jax.device_put(val_idx, replicated)
        val_mask = jax.device_put(val_mask, replicated)

    def _apply(variables, batch, hp_row, rng, train, shared):
        # 6-arg hook when no shared computation (back-compat), 7-arg
        # (trailing shared output) when shared_fn is set.
        if shared_fn is None:
            return apply_fn(model, variables, batch, hp_row, rng, train)
        return apply_fn(model, variables, batch, hp_row, rng, train, shared)

    def _trial_step(c, active, hp_row, srng, batch, shared):
        params, stats, opt = c

        def loss_fn(p):
            variables = {"params": p}
            if stats:
                variables["batch_stats"] = stats
            out, mutated = _apply(variables, batch, hp_row, srng, True,
                                  shared)
            loss = trial_criterion(
                out["logits"], batch["label"],
                jnp.ones(batch["label"].shape[0], jnp.float32),
                hp_row, class_weights)
            return loss, mutated.get("batch_stats", stats)

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        # torch Adam weight_decay: L2 into the grad BEFORE the moments
        # (optim.py:28-35 ordering), lr as a traced multiplier.
        grads = jax.tree_util.tree_map(
            lambda g, p: g + hp_row["l2_reg"] * p, grads, params)
        updates, new_opt = adam.update(grads, opt, params)
        if lr_select is None:
            new_params = jax.tree_util.tree_map(
                lambda p, u: p - hp_row["lr"] * u, params, updates)
        else:
            # Per-group traced lrs (``optim.build_optimizer`` parity for
            # the vmapped trainer): ``lr_select(hp_row, path_keys)``
            # returns this leaf's traced lr — e.g. the MRI search's
            # head-at-lr / backbone-at-lr_pretrained split, with a traced
            # 0.0 reproducing the frozen group's zero updates exactly
            # (Adam moments differ from set_to_zero but are unobservable
            # through the 0-scaled update).
            def upd(kp, p, u):
                keys = tuple(getattr(x, "key", getattr(x, "idx", str(x)))
                             for x in kp)
                return p - lr_select(hp_row, keys) * u

            new_params = jax.tree_util.tree_map_with_path(upd, params,
                                                          updates)
        new_c = (new_params, new_stats, new_opt)
        # Stopped trials freeze whole: params, BN stats, Adam moments.
        new_c = jax.tree_util.tree_map(
            lambda n, o: jnp.where(active > 0, n, o), new_c, c)
        return new_c, loss

    # Scan-of-vmap (not vmap-of-scan): the scan body first runs the
    # trial-invariant shared_fn unbatched, then vmaps the per-trial update
    # over the stacked axis. Without shared_fn this is the identical
    # program vmap would build (vmap pushes through scan batching only
    # the body), pinned by test_stacked_trials_match_solo_runs.
    # Data is a jit ARGUMENT, not a closure constant: closed-over
    # arrays are baked into the HLO as literals, which bloats the
    # executable and overflows remote-compile transports for
    # volume-scale splits (a whole PET split is ~100s of MB).
    def train_epoch(shared_carry, carry, active, hp, rngs, perm, data):
        def step(c, xs):
            sc, tc = c
            idx, step_i = xs
            batch = {k: v[idx] for k, v in data.items()}
            shared = None
            if shared_fn is not None:
                shared, sc = shared_fn(sc, batch, True)
            srngs = jax.vmap(lambda r: jax.random.fold_in(r, step_i))(rngs)
            new_tc, losses = jax.vmap(
                _trial_step, in_axes=(0, 0, 0, 0, None, None))(
                tc, active, hp, srngs, batch, shared)
            return (sc, new_tc), losses

        steps = jnp.arange(perm.shape[0], dtype=jnp.int32)
        (shared_carry, carry), losses = jax.lax.scan(
            step, (shared_carry, carry), (perm, steps))
        return shared_carry, carry, losses.mean(axis=0)

    def eval_epoch(shared_carry, carry, hp, data):
        def one_batch(sc, xs):
            idx, mask = xs
            batch = {k: v[idx] for k, v in data.items()}
            shared = None
            if shared_fn is not None:  # eval reads the carry, no advance
                shared, _ = shared_fn(sc, batch, False)

            def one_trial(ci, hp_row):
                params, stats, _ = ci
                variables = {"params": params}
                if stats:
                    variables["batch_stats"] = stats
                out, _ = _apply(variables, batch, hp_row, root, False,
                                shared)
                return trial_criterion(out["logits"], batch["label"],
                                       mask, hp_row, class_weights)

            return sc, jax.vmap(one_trial)(carry, hp)

        _, losses = jax.lax.scan(one_batch, shared_carry,
                                 (val_idx, val_mask))
        return losses.mean(axis=0)

    epoch_fn = jax.jit(train_epoch, donate_argnums=(0, 1))
    eval_fn = jax.jit(eval_epoch)

    def _snap(sel, new, old):
        # Per-trial select over the stacked leading axis.
        return jax.tree_util.tree_map(
            lambda n, o: jnp.where(
                sel.reshape((-1,) + (1,) * (n.ndim - 1)), n, o), new, old)

    snap_fn = jax.jit(_snap, donate_argnums=(2,))

    shuffle_rng = np.random.default_rng(seed)
    best = np.full(k_trials, np.inf)
    wait = np.zeros(k_trials, np.int64)
    active = np.ones(k_trials, bool)
    last_val = np.full(k_trials, np.inf)
    stopped_epoch = np.full(k_trials, max_epochs - 1, np.int64)
    history = []
    carry = carry0
    # Copy the caller's shared carry: epoch_fn donates its buffers, and
    # study drivers (train/fusion_hpo.py) reuse one shared_carry0 across
    # every trial bucket — without the copy the second bucket would hand
    # XLA deleted buffers. BN-stat trees are tiny next to an HPO run.
    shared_carry = (jax.tree_util.tree_map(jnp.array, shared_carry0)
                    if shared_carry0 is not None else ())
    if trial_sharding is not None and shared_carry0 is not None:
        shared_carry = jax.device_put(shared_carry, replicated)
    best_snapshot = None
    if track_best:  # copy: epoch_fn donates the live carry's buffers
        best_snapshot = jax.tree_util.tree_map(jnp.array,
                                               (carry0[0], carry0[1]))
    for epoch in range(max_epochs):
        perm = jnp.asarray(
            shuffle_rng.permutation(n_train)[:n_batches * b].astype(np.int32)
            .reshape(n_batches, b))
        active_dev = jnp.asarray(active, jnp.float32)
        if trial_sharding is not None:
            perm = jax.device_put(perm, replicated)
            active_dev = jax.device_put(active_dev, trial_sharding)
        epoch_keys = jax.vmap(lambda k: jax.random.fold_in(k, epoch))(
            trial_keys)
        shared_carry, carry, _ = epoch_fn(shared_carry, carry, active_dev,
                                          hp, epoch_keys, perm, train_data)
        val = np.asarray(eval_fn(shared_carry, carry, hp, val_data),
                         np.float64)
        history.append(val)
        last_val = np.where(active, val, last_val)
        stopped_epoch = np.where(active, epoch, stopped_epoch)
        # EarlyStopping replay (optim.py:130-148): reset on strict
        # improvement, stop after `patience` consecutive non-improvements.
        improved = val < best
        if track_best and (active & improved).any():
            # skip the K-model select entirely on no-improvement epochs
            # (the common case late in a fit) — improvement is already
            # known host-side
            sel = jnp.asarray(active & improved)
            if trial_sharding is not None:
                sel = jax.device_put(sel, trial_sharding)
            best_snapshot = snap_fn(sel, (carry[0], carry[1]),
                                    best_snapshot)
        best = np.where(active & improved, val, best)
        wait = np.where(active, np.where(improved, 0, wait + 1), wait)
        active = active & (wait < patience)
        if not active.any():
            break

    info = {"val_history": np.stack(history),
            "stopped_epoch": stopped_epoch}
    if track_best:
        info["best_carry"] = best_snapshot
        info["best_val"] = best
    if return_state:
        info["carry"] = carry
        info["shared_carry"] = shared_carry
    return last_val, info


def optimize_batched(study, sample_hparams: Callable,
                     batch_objective: Callable, *, n_trials: int,
                     parallel: int, signature_fn: Callable,
                     timeout: Optional[float] = None):
    """Drive a study with K-at-a-time proposals and vectorized evaluation.

    Each round asks ``parallel`` trials (optuna concurrent-worker
    semantics: all sampled from the current history), buckets them by
    ``signature_fn(hparams)`` (the static-shape signature), and hands each
    bucket to ``batch_objective(signature, [hparams,...]) -> values``.
    Exceptions from a bucket score all its trials ``inf`` when they look
    like OOM (hpo.oom_guard semantics), else propagate.
    """
    start = time.time()
    done = 0
    while done < n_trials:
        if timeout is not None and time.time() - start > timeout:
            break
        k = min(parallel, n_trials - done)
        asked = []
        for _ in range(k):
            trial = study.ask()
            asked.append((trial, sample_hparams(trial)))
        buckets: dict = {}
        for trial, hparams in asked:
            buckets.setdefault(signature_fn(hparams), []).append(
                (trial, hparams))
        for signature, items in buckets.items():
            try:
                values = batch_objective(signature,
                                         [hp for _, hp in items])
            except Exception as e:
                if ("RESOURCE_EXHAUSTED" in str(e)
                        or "Out of memory" in str(e)):
                    print("Aborting run, not enough memory!")
                    values = [math.inf] * len(items)
                else:
                    raise
            for (trial, _), value in zip(items, values):
                study.tell(trial, float(value))
        done += k
    return study
