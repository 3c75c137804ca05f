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
                 preprocess=None, mesh=None, serve_fn=None):
        """``serve_fn`` optionally replaces the model-apply serve core
        with a prebuilt ``batch -> {'logits','probs','embeddings'}``
        function (e.g. the int8 path from ``inference.quantize`` — which
        applies its own preprocessing); padding/sharding/iteration stay
        identical to the float predictor."""
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.preprocess = preprocess

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

            if not self._serve_only:  # serve graphs don't read variables
                self.variables = replicate(variables, mesh)
            self._shard = batch_sharding(mesh)
        else:
            self._shard = None

    def _pad(self, batch: dict, n: int):
        pad = self.batch_size - n
        if pad == 0:
            return batch
        return {k: np.concatenate(
            [v, np.zeros((pad,) + np.shape(v)[1:], np.asarray(v).dtype)])
            for k, v in batch.items()}

    def predict_batch(self, batch: dict) -> dict:
        """One batch dict (any leading size <= batch_size) -> outputs."""
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
        dataset yields empty ``(0,)`` arrays rather than an error.
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
            empty = np.zeros((0,), np.float32)
            return {"logits": empty, "probs": empty, "embeddings": {}}
        return {
            "logits": np.concatenate([o["logits"] for o in outs]),
            "probs": np.concatenate([o["probs"] for o in outs]),
            "embeddings": {
                k: np.concatenate([o["embeddings"][k] for o in outs])
                for k in outs[0].get("embeddings", {})
            },
        }
