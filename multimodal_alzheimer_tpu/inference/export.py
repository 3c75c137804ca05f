"""AOT model export for serving (StableHLO via jax.export).

Serializes a (model, variables) inference function to a portable artifact
that reloads and executes without the model's Python code — the deployment
story the reference (research checkpoints only) lacks. Weights are baked
into the exported computation as constants; the artifact is
shape-specialized to the given batch spec.
"""

from __future__ import annotations

import jax


def export_model(model, variables: dict, example_batch: dict,
                 preprocess=None) -> bytes:
    """Serialize eval-mode inference to a StableHLO artifact.

    Args:
      model: flax module (batch dict -> {'logits', ...}).
      variables: trained {'params', 'batch_stats'}.
      example_batch: batch dict giving the serving shapes/dtypes.
      preprocess: optional on-device normalization fn (fused in).

    Returns:
      Serialized bytes (jax.export format); see ``load_exported``.
    """
    from jax import export as jax_export

    frozen = jax.tree_util.tree_map(jax.numpy.asarray, variables)

    def serve(batch):
        if preprocess is not None:
            batch = preprocess(batch)
        out = model.apply(frozen, batch, train=False)
        return {"logits": out["logits"],
                "probs": jax.nn.softmax(out["logits"], axis=-1)}

    exported = jax_export.export(jax.jit(serve))(example_batch)
    return bytes(exported.serialize())


def export_serve_fn(serve_fn, example_batch: dict) -> bytes:
    """Serialize an arbitrary serving callable (batch dict -> output
    dict) to the same artifact format as ``export_model``.

    This is the export path for the optimized serving graphs that are
    not a bare ``model.apply`` — the int8 PTQ serves, the BN-folded
    float serves, and the fusion serves with external quantized towers
    (``inference/quantize.py``); their weights/scales are closure
    constants and get baked into the artifact.
    """
    from jax import export as jax_export

    exported = jax_export.export(jax.jit(serve_fn))(example_batch)
    return bytes(exported.serialize())


def load_exported(blob: bytes):
    """Deserialize an exported artifact; returns fn(batch) -> outputs."""
    from jax import export as jax_export

    exported = jax_export.deserialize(blob)

    def serve(batch):
        return exported.call(batch)

    return serve
