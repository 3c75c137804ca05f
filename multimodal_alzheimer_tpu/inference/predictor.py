"""Serving-oriented predictor: batched jitted inference + embeddings.

The reference has no serving layer (evaluation only, via Lightning
trainer.test). For production inference this wraps a (model, variables)
pair into a jit-compiled, fixed-batch predictor with automatic padding of
ragged tails (one compilation per model, not per batch size), optional
data-parallel sharding over a mesh, and access to the embedding taps used
by the fusion stages.
"""

from __future__ import annotations

import jax
import numpy as np


class Predictor:
    def __init__(self, model, variables: dict, batch_size: int = 32,
                 preprocess=None, mesh=None, serve_fn=None, ladder=None):
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
        """
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
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
        placement happens at batch level."""
        if self._shard is not None:
            return sample
        return jax.device_put(sample)

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
