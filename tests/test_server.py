"""BatchingServer: dynamic batching, parity, validation, failure isolation.

The reference has no online-serving layer (evaluation only, via Lightning
trainer.test — reference: pkg/testing/test_*.py); BatchingServer is the
beyond-parity online half of the serving stack, so the tests pin its
contract: batch composition never changes a client's numbers, malformed
requests fail at submit, and a failed batch doesn't kill the server.
"""

import threading

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_alzheimer_tpu.inference.predictor import Predictor
from multimodal_alzheimer_tpu.inference.server import BatchingServer
from multimodal_alzheimer_tpu.models import TabularMLP


def _predictor(batch_size=8):
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16, 32)})
    batch = {"tabular": jnp.zeros((2, 9))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return Predictor(model, variables, batch_size=batch_size)


def test_results_match_direct_prediction():
    pred = _predictor()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(13, 9)).astype(np.float32)  # ragged vs batch 8
    direct = pred.predict_batch({"tabular": x[:8]})
    with BatchingServer(pred, max_wait_s=0.05) as server:
        futures = [server.submit({"tabular": x[i]}) for i in range(13)]
        results = [f.result(timeout=60) for f in futures]
    ref = np.concatenate(
        [direct["logits"], pred.predict_batch({"tabular": x[8:]})["logits"]])
    got = np.stack([r["logits"] for r in results])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    for r in results:
        assert r["probs"].shape == (3,)
        assert r["embeddings"]["decoder"].shape == (32,)


def test_full_batch_serves_as_one_launch():
    pred = _predictor(batch_size=4)
    rng = np.random.default_rng(1)
    server = BatchingServer(pred, max_wait_s=2.0)
    futures = [server.submit(
        {"tabular": rng.normal(size=(9,)).astype(np.float32)})
        for _ in range(8)]
    for f in futures:
        f.result(timeout=60)
    server.close()
    assert server.samples_served == 8
    assert server.batches_served == 2  # two full batches, no partials


def test_timeout_flushes_partial_batch():
    pred = _predictor(batch_size=8)
    with BatchingServer(pred, max_wait_s=0.01) as server:
        f = server.submit({"tabular": np.zeros(9, np.float32)})
        out = f.result(timeout=60)
    assert out["logits"].shape == (3,)
    assert server.batches_served == 1


def test_concurrent_clients():
    pred = _predictor(batch_size=8)
    rng = np.random.default_rng(2)
    xs = rng.normal(size=(32, 9)).astype(np.float32)
    ref = np.concatenate([
        pred.predict_batch({"tabular": xs[i:i + 8]})["logits"]
        for i in range(0, 32, 8)])
    got = np.zeros_like(ref)
    errors = []
    with BatchingServer(pred, max_wait_s=0.02) as server:
        def client(i):
            try:
                r = server.submit({"tabular": xs[i]}).result(timeout=60)
                got[i] = r["logits"]
            except Exception as e:  # surfaced below
                errors.append(e)
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert not errors
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_submit_validates_shape_and_keys():
    pred = _predictor()
    with BatchingServer(pred, max_wait_s=0.01) as server:
        server.submit({"tabular": np.zeros(9, np.float32)}).result(timeout=60)
        try:
            server.submit({"tabular": np.zeros(7, np.float32)})
            raise AssertionError("shape mismatch accepted")
        except ValueError:
            pass
        try:
            server.submit({"pet": np.zeros(9, np.float32)})
            raise AssertionError("key mismatch accepted")
        except ValueError:
            pass


def test_batch_failure_is_isolated():
    pred = _predictor()
    calls = {"n": 0}
    real = pred.predict_parts  # the server's hot path (on-device stack)

    def flaky(samples):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected device failure")
        return real(samples)

    pred.predict_parts = flaky
    server = BatchingServer(pred, max_wait_s=0.01)
    bad = server.submit({"tabular": np.zeros(9, np.float32)})
    try:
        bad.result(timeout=60)
        raise AssertionError("expected injected failure")
    except RuntimeError as e:
        assert "injected" in str(e)
    good = server.submit({"tabular": np.zeros(9, np.float32)})
    assert good.result(timeout=60)["logits"].shape == (3,)
    server.close()
    assert server.batches_served == 1  # failed batch not counted


def test_cancelled_future_does_not_kill_worker():
    """A client cancelling its queued request must not break delivery:
    set_result on a cancelled future raises InvalidStateError, which
    would kill the worker loop and hang every later submission."""
    pred = _predictor(batch_size=4)
    server = BatchingServer(pred, max_wait_s=0.2)
    futures = [server.submit({"tabular": np.zeros(9, np.float32)})
               for _ in range(3)]
    won = futures[1].cancel()  # False only if the worker claimed it first
    for i, f in enumerate(futures):
        if i == 1 and won:
            assert f.cancelled()
        else:
            assert f.result(timeout=60)["logits"].shape == (3,)
    # The worker survived the cancelled delivery: later requests serve.
    late = server.submit({"tabular": np.zeros(9, np.float32)})
    assert late.result(timeout=60)["logits"].shape == (3,)
    server.close()


def test_submit_after_close_raises_and_close_is_idempotent():
    pred = _predictor()
    server = BatchingServer(pred, max_wait_s=0.01)
    server.close()
    try:
        server.submit({"tabular": np.zeros(9, np.float32)})
        raise AssertionError("submit accepted after close")
    except RuntimeError as e:
        assert "closed" in str(e)
    server.close()  # second close: no second sentinel, no deadlock


def test_staging_pool_bounds_buffers_and_keeps_parity():
    """VERDICT r4 #5: with staging_slots the server stages every request
    through a fixed ring of recycled host buffers (bounding what an
    H2D-retaining client can leak) — results identical, slots recycled,
    no unbounded allocation under steady load."""
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16, 32)})
    batch = {"tabular": jnp.zeros((2, 9))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    pred = Predictor(model, variables, batch_size=4, staging_slots=6)
    plain = Predictor(model, variables, batch_size=4)

    rng = np.random.default_rng(11)
    x = rng.normal(size=(40, 9)).astype(np.float32)
    with BatchingServer(pred, max_wait_s=0.02) as server:
        futures = [server.submit({"tabular": x[i]}) for i in range(40)]
        got = np.stack([f.result(timeout=60)["logits"] for f in futures])

    ref = np.concatenate(
        [plain.predict_batch({"tabular": x[i:i + 4]})["logits"]
         for i in range(0, 40, 4)])
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # the ring never grew past its bound; every slot went back
    pool = pred.staging_pool
    made = sum(pool._made.values())
    assert made <= 6, made
    free = sum(len(v) for v in pool._free.values())
    assert free == made, (free, made)  # all released after serving


def test_cancelled_and_rejected_requests_release_pool_slots():
    """Code-review r5: a cancelled queued request (client timeout) and a
    submit raced against close must return their staging-ring slots —
    otherwise client timeouts drain the pool to zero and every later
    request silently takes the one-off-buffer fallback path."""
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16,)})
    batch = {"tabular": jnp.zeros((2, 9))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    pred = Predictor(model, variables, batch_size=4, staging_slots=4)
    server = BatchingServer(pred, max_wait_s=5.0)
    f1 = server.submit({"tabular": np.zeros(9, np.float32)})
    f2 = server.submit({"tabular": np.zeros(9, np.float32)})
    assert f2.cancel()  # still queued behind the batching window
    server.close()  # drains: serves f1, must release f2's slot too
    assert f1.result(timeout=60)["logits"].shape == (3,)
    pool = pred.staging_pool
    made = sum(pool._made.values())
    free = sum(len(v) for v in pool._free.values())
    assert free == made, (free, made)  # nothing stuck in limbo
    # submit after close: fast-fails without touching the pool
    try:
        server.submit({"tabular": np.zeros(9, np.float32)})
        raise AssertionError("accepted after close")
    except RuntimeError:
        pass
    assert sum(len(v) for v in pool._free.values()) == made


def test_staging_pool_burst_falls_back_not_fails():
    """A burst deeper than the pool serves correctly via one-off
    buffers (counted), rather than blocking or erroring."""
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16,)})
    batch = {"tabular": jnp.zeros((2, 9))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    pred = Predictor(model, variables, batch_size=8, staging_slots=2)
    rng = np.random.default_rng(12)
    x = rng.normal(size=(8, 9)).astype(np.float32)
    staged = [pred.stage_sample({"tabular": x[i]}) for i in range(8)]
    out = pred.predict_parts(staged)
    ref = pred.predict_batch({"tabular": x})
    np.testing.assert_allclose(out["logits"], ref["logits"],
                               rtol=1e-5, atol=1e-6)
    assert pred.staging_pool.fallbacks == 6  # 8 staged, 2 slots
    for s in staged:
        s.release()
    assert sum(len(v) for v in pred.staging_pool._free.values()) == 2


def test_f16_submissions_match_f32_serving():
    """Backs the soak guidance (BENCH_soak_r05): submitting float16
    samples halves the per-request host-RSS cost on H2D-retaining rigs
    and must serve metric-equivalently. The MRI serve upcasts inside
    its preprocess (the f16-cache convention), so f16-submitted volumes
    reproduce f32 probabilities to f16 input precision."""
    import jax as _jax

    from multimodal_alzheimer_tpu.models import AnatCNN
    from multimodal_alzheimer_tpu.ops.normalization import (
        batched_normalize_mri,
    )

    shape = (12, 14, 12)
    model = AnatCNN.from_hparams(
        {"n_classes": 3, "resnet_depth": 10, "linear_out": (),
         "batchnorm_begin": False, "lr": 1e-3}, dtype=jnp.bfloat16)

    def pre(batch):
        out = dict(batch)
        out["mri"] = batched_normalize_mri(
            out["mri"], out.pop("mri_mask"),
            {"per_scan_norm": "min_max"}, 0.99)
        return out

    rng = np.random.default_rng(3)
    mri = rng.normal(900, 400, (2,) + shape).astype(np.float32)
    mask = (rng.random((2,) + shape) > 0.35).astype(np.float32)
    variables = model.init(_jax.random.PRNGKey(0),
                           pre({"mri": mri, "mri_mask": mask}),
                           train=False)
    pred = Predictor(model, variables, batch_size=2, preprocess=pre)
    f32 = pred.predict_batch({"mri": mri, "mri_mask": mask})
    f16 = pred.predict_batch({"mri": mri.astype(np.float16),
                              "mri_mask": mask.astype(np.float16)})
    assert np.array_equal(f32["probs"].argmax(-1), f16["probs"].argmax(-1))
    np.testing.assert_allclose(f16["probs"], f32["probs"], atol=0.02)


def test_close_releases_committed_spec():
    """VERDICT r4 #7: the shape/dtype spec the first sample committed
    the server to is released on close — a closed server pins no stale
    serving contract."""
    pred = _predictor()
    server = BatchingServer(pred, max_wait_s=0.01)
    server.submit({"tabular": np.zeros(9, np.float32)}).result(timeout=60)
    assert server._spec is not None
    server.close()
    assert server._spec is None


def test_close_without_drain_rejects_queued():
    pred = _predictor(batch_size=8)
    server = BatchingServer(pred, max_wait_s=30.0)
    # First submit is grabbed by the worker (it waits on the deadline);
    # close(drain=False) must still deliver an answer or error to all.
    futures = [server.submit({"tabular": np.zeros(9, np.float32)})
               for _ in range(3)]
    server.close(drain=False)
    done = [f for f in futures if f.done()]
    assert len(done) == 3
    for f in futures:
        exc = f.exception()
        if exc is not None:
            assert "closed" in str(exc)
        else:
            assert f.result()["logits"].shape == (3,)


def test_ladder_lone_request_runs_small_rung():
    """Latency tiering (VERDICT r3 #1): a lone request through a
    laddered predictor runs a small compiled rung, and its numbers match
    the un-laddered full-batch serve at ulp tolerance."""
    model = TabularMLP.from_hparams({"n_classes": 3, "hidden": (16, 32)})
    batch = {"tabular": jnp.zeros((2, 9))}
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    pred = Predictor(model, variables, batch_size=8, ladder=(2, 4))
    pred.warmup({"tabular": np.zeros((1, 9), np.float32)})
    flat = Predictor(model, variables, batch_size=8)

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 9)).astype(np.float32)
    ref = flat.predict_batch({"tabular": x})
    with BatchingServer(pred, max_wait_s=0.01) as server:
        got = server.submit({"tabular": x[0]}).result(timeout=60)
    np.testing.assert_allclose(got["logits"], ref["logits"][0],
                               rtol=1e-6, atol=1e-7)
    assert server.batch_histogram == {1: 1}
