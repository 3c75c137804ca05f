"""Serving-oriented predictor: batched jitted inference + embeddings.

The reference has no serving layer (evaluation only, via Lightning
trainer.test). For production inference this wraps a (model, variables)
pair into a jit-compiled, fixed-batch predictor with automatic padding of
ragged tails (one compilation per model, not per batch size), optional
data-parallel sharding over a mesh, and access to the embedding taps used
by the fusion stages.
"""

from __future__ import annotations

import threading

import jax
import numpy as np


class StagedSample:
    """A submit-time-staged sample: device arrays + its pool slot.

    Behaves as a read-only mapping of key -> jax.Array for the serve
    path; ``release()`` returns the host slot to the staging pool once
    the sample's batch has been served (the transfer is certainly
    complete by then — results were fetched). Slots released twice are
    a no-op."""

    def __init__(self, arrays: dict, pool=None, slot=None):
        self.arrays = arrays
        self._pool = pool
        self._slot = slot

    def __getitem__(self, k):
        return self.arrays[k]

    def __iter__(self):
        return iter(self.arrays)

    def keys(self):
        return self.arrays.keys()

    def release(self) -> None:
        pool, slot = self._pool, self._slot
        self._pool = self._slot = None
        if pool is not None:
            pool.release(slot)


class _HostStagingPool:
    """Fixed ring of reusable host buffers for submit-time H2D staging.

    Rationale (CLAUDE.md round-4 measurement): the axon remote-TPU
    client retains a reference to EVERY host buffer handed to
    ``device_put`` for process lifetime (~1 GB RSS per GB shipped), so
    a server staging a fresh numpy array per request leaks sample-sized
    host memory forever (~OOM in hours at 5 vol/s x 7.2 MB). Copying
    each request into one of ``n_slots`` recycled buffers bounds what
    the client can retain to the fixed pool. On healthy local-PCIe rigs
    the pool is still harmless (one extra host memcpy per request,
    ~1 ms for a 7.2 MB volume).

    Slots are allocated lazily per sample spec (keyed on shapes/dtypes)
    and handed out round-robin from a free list; a burst deeper than
    the pool falls back to a fresh one-off buffer (counted in
    ``fallbacks`` — size the pool >= the batching window's depth).
    """

    def __init__(self, n_slots: int):
        self.n_slots = int(n_slots)
        self._free: dict = {}   # spec signature -> [slot dicts]
        self._made: dict = {}   # spec signature -> count
        self._lock = threading.Lock()
        self.fallbacks = 0

    @staticmethod
    def _sig(sample: dict):
        return tuple(sorted((k, np.shape(v), np.asarray(v).dtype.str)
                            for k, v in sample.items()))

    def acquire(self, sample: dict):
        """Copy ``sample`` into a pooled slot; returns (slot, sig) or
        (None, None) when the pool is exhausted (caller falls back)."""
        sig = self._sig(sample)
        with self._lock:
            free = self._free.setdefault(sig, [])
            if free:
                slot = free.pop()
            elif self._made.get(sig, 0) < self.n_slots:
                slot = {k: np.empty(np.shape(v), np.asarray(v).dtype)
                        for k, v in sample.items()}
                self._made[sig] = self._made.get(sig, 0) + 1
            else:
                self.fallbacks += 1
                return None, None
        for k, v in sample.items():
            np.copyto(slot[k], v)
        return slot, sig

    def release(self, token) -> None:
        if token is None:
            return
        slot, sig = token
        with self._lock:
            self._free[sig].append(slot)


class Predictor:
    def __init__(self, model, variables: dict, batch_size: int = 32,
                 preprocess=None, mesh=None, serve_fn=None, ladder=None,
                 staging_slots: int = 0):
        """``serve_fn`` optionally replaces the model-apply serve core
        with a prebuilt ``batch -> {'logits','probs','embeddings'}``
        function (e.g. the int8 path from ``inference.quantize`` — which
        applies its own preprocessing); padding/sharding/iteration stay
        identical to the float predictor.

        ``ladder`` optionally lists additional compiled batch sizes below
        ``batch_size`` (e.g. ``(8, 32)`` with ``batch_size=128``): a
        ragged batch pads only to the smallest rung >= its size instead
        of the full width, so a lone request runs the 8-wide program
        (~rung/batch_size of the full device time) while bursts still
        ride the big batch. One XLA executable per rung (jit caches by
        shape); results are the same per-sample computation at every
        rung — batch composition never changes a client's numbers. With
        a mesh, every rung must divide the device count.

        ``staging_slots`` > 0 routes ``stage_sample`` through a
        ``_HostStagingPool`` of that many recycled host buffers per
        sample spec — REQUIRED for long-lived servers on rigs whose
        client retains every H2D host buffer (axon remote TPU,
        CLAUDE.md): without it, per-request staging leaks sample-sized
        host RSS forever. Size it >= the batching window depth (e.g.
        2 x batch_size); deeper bursts fall back to one-off buffers
        (counted in ``staging_pool.fallbacks``).
        """
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.staging_pool = (_HostStagingPool(staging_slots)
                             if staging_slots else None)
        rungs = sorted({int(r) for r in (ladder or ())} | {int(batch_size)})
        if rungs[-1] != batch_size:
            raise ValueError(
                f"ladder rungs {rungs} exceed batch_size {batch_size}")
        self.ladder = tuple(rungs)
        self.preprocess = preprocess
        self._parts_fns: dict = {}  # rung -> jitted on-device-stack serve

        self._serve_only = serve_fn is not None
        if serve_fn is not None:
            def fn(variables, batch):
                del variables  # quantized/folded graphs bake their params
                return serve_fn(batch)
            # Jit the bare serve: threading the unused float tree through
            # jit would pay per-call pytree flatten/hash of ~100s of MB
            # on the hot path and keep the float weights resident next to
            # the closure-baked constants.
            self._fn = jax.jit(serve_fn)
        else:
            def fn(variables, batch):
                if preprocess is not None:
                    batch = preprocess(batch)
                out = model.apply(variables, batch, train=False)
                probs = jax.nn.softmax(out["logits"], axis=-1)
                return {"logits": out["logits"], "probs": probs,
                        "embeddings": out["embeddings"]}
            self._fn = jax.jit(fn)

        self._raw_fn = fn  # un-jitted, for composition (scan/export/bench)
        if mesh is not None:
            from multimodal_alzheimer_tpu.parallel import (
                batch_sharding,
                replicate,
            )

            n_dev = int(mesh.devices.size)
            bad = [r for r in self.ladder if r % n_dev]
            if bad:
                # Fail at construction: a non-divisible rung would only
                # surface at request time, inside device_put on a live
                # serving path.
                raise ValueError(
                    f"ladder rungs {bad} do not divide the mesh's "
                    f"{n_dev} devices; every rung must shard evenly")
            if not self._serve_only:  # serve graphs don't read variables
                self.variables = replicate(variables, mesh)
            self._shard = batch_sharding(mesh)
        else:
            self._shard = None

    def _pad_target(self, n: int) -> int:
        """Smallest ladder rung that fits n samples."""
        for rung in self.ladder:
            if n <= rung:
                return rung
        raise ValueError(f"batch of {n} exceeds batch_size "
                         f"{self.batch_size}")

    def _pad(self, batch: dict, n: int):
        pad = self._pad_target(n) - n
        if pad == 0:
            return batch
        return {k: np.concatenate(
            [v, np.zeros((pad,) + np.shape(v)[1:], np.asarray(v).dtype)])
            for k, v in batch.items()}

    def warmup(self, example_batch: dict, parts: bool = False) -> None:
        """Compile every ladder rung up front (one zero-padded call per
        rung) so no live request pays an XLA compile. ``example_batch``
        needs >= 1 sample with the serving shapes/dtypes. ``parts``
        additionally compiles the per-rung on-device-stack programs
        (``predict_parts`` — the online-serving hot path)."""
        one = {k: np.asarray(v)[:1] for k, v in example_batch.items()}
        for rung in self.ladder:
            self.predict_batch(
                {k: np.concatenate([v] * rung) for k, v in one.items()})
        if parts:
            sample = {k: v[0] for k, v in one.items()}
            for rung in self.ladder:
                self.predict_parts([sample] * rung)

    def stage_sample(self, sample: dict):
        """Start this sample's async H2D transfer now (submit time), so
        it overlaps the batching window instead of serializing into the
        dispatch. No-op (returns the host sample) under a mesh — sharded
        placement happens at batch level.

        With ``staging_slots`` the sample is first copied into a pooled
        recycled host buffer (bounding H2D-retention leaks; see
        ``_HostStagingPool``) and the returned ``StagedSample`` must be
        ``release()``d after its batch is served — ``BatchingServer``
        does this; callers composing manually own the release."""
        if self._shard is not None:
            return sample
        if self.staging_pool is None:
            return StagedSample(jax.device_put(sample))
        slot, sig = self.staging_pool.acquire(sample)
        if slot is None:  # pool exhausted: one-off buffer (counted)
            return StagedSample(jax.device_put(sample))
        return StagedSample(jax.device_put(slot), self.staging_pool,
                            (slot, sig))

    def predict_parts(self, samples: list) -> dict:
        """Serve a list of per-sample dicts (no batch axis), stacking —
        and padding, by repeating the last sample — ON DEVICE inside the
        rung's compiled program.

        This is the online-serving hot path: ``predict_batch`` pads on
        the host, so a lone request ships rung x sample_bytes over PCIe
        (or worse, a remote-TPU tunnel) when only one sample is real.
        Here only the real samples move (ideally staged already, via
        ``stage_sample`` at enqueue time) and the stack+pad runs on
        device. One compiled program per rung (argument arity = rung).
        Per-sample results are identical to ``predict_batch``'s: padding
        composition never changes a sample's computation.
        """
        n = len(samples)
        rung = self._pad_target(n)
        # unwrap StagedSample handles to their array dicts (plain jit
        # pytree args); plain dicts pass through
        samples = [getattr(s, "arrays", s) for s in samples]
        parts = list(samples) + [samples[-1]] * (rung - n)
        fn = self._parts_fns.get(rung)
        if fn is None:
            if self._serve_only:
                def fn(*parts):
                    import jax.numpy as jnp

                    batch = {k: jnp.stack([p[k] for p in parts])
                             for k in parts[0]}
                    return self._raw_fn(None, batch)
            else:
                def fn(variables, *parts):
                    import jax.numpy as jnp

                    batch = {k: jnp.stack([p[k] for p in parts])
                             for k in parts[0]}
                    return self._raw_fn(variables, batch)
            fn = jax.jit(fn)
            self._parts_fns[rung] = fn
        out = (fn(*parts) if self._serve_only
               else fn(self.variables, *parts))
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], out)

    def predict_batch(self, batch: dict) -> dict:
        """One batch dict (any leading size <= batch_size) -> outputs.

        Pads to the smallest compiled ladder rung that fits (the full
        ``batch_size`` when no ladder was configured).
        """
        n = len(next(iter(batch.values())))
        padded = self._pad({k: np.asarray(v) for k, v in batch.items()}, n)
        if self._shard is not None:
            padded = jax.device_put(padded, self._shard)
        out = (self._fn(padded) if self._serve_only
               else self._fn(self.variables, padded))
        return jax.tree_util.tree_map(lambda x: np.asarray(x)[:n], out)

    def predict(self, dataset_or_batches) -> dict:
        """Iterate batches (or an indexable dataset) and concatenate.

        Degrades gracefully on serve cores without embedding taps
        (exported float/folded/int8 StableHLO artifacts return only
        ``{'logits','probs'}`` — same contract ``server.py`` honors):
        the result carries an empty ``embeddings`` dict. An empty
        dataset yields ``(0, n_classes)`` logits/probs (class count from
        the wrapped model; ``(0, 0)`` for bare serve cores, which don't
        expose one) rather than an error.
        """
        from multimodal_alzheimer_tpu.data.pipeline import DataLoader

        if hasattr(dataset_or_batches, "__getitem__"):
            loader = DataLoader(dataset_or_batches, self.batch_size,
                                device_put=False)
        else:
            loader = dataset_or_batches
        outs = []
        for batch in loader:
            batch = dict(batch)
            batch.pop("label", None)
            outs.append(self.predict_batch(batch))
        if not outs:
            n_classes = int(getattr(self.model, "n_classes", 0) or 0)
            empty = np.zeros((0, n_classes), np.float32)
            return {"logits": empty, "probs": empty, "embeddings": {}}
        return {
            "logits": np.concatenate([o["logits"] for o in outs]),
            "probs": np.concatenate([o["probs"] for o in outs]),
            "embeddings": {
                k: np.concatenate([o["embeddings"][k] for o in outs])
                for k in outs[0].get("embeddings", {})
            },
        }
