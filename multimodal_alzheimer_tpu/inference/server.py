"""Dynamic-batching serving front-end (the online-inference layer).

The reference has no serving story at all — evaluation happens offline
through Lightning ``trainer.test`` (reference: pkg/testing/test_*.py).
``inference.predictor.Predictor`` gives this repo an offline batch
surface; this module adds the *online* half: concurrent clients submit
single samples and a collator thread assembles them into fixed-size
device batches, so the TPU always sees its compiled batch shape (one XLA
program, MXU-efficient batch) while clients keep a simple
one-sample-in/one-result-out future API.

Semantics:

* FIFO: requests are batched in arrival order.
* A batch launches when ``predictor.batch_size`` requests are waiting or
  the oldest waiting request has aged ``max_wait_s`` — the standard
  throughput/latency knob.
* Latency tiering: give the Predictor a batch-size ``ladder`` (e.g.
  ``(8, 32)`` under ``batch_size=128``) and a deadline batch of k
  requests runs the smallest compiled rung >= k — a lone request pays
  an 8-wide program instead of a 128-wide one. Call
  ``predictor.warmup(example)`` before serving so no live request pays
  an XLA compile. ``batch_histogram`` records dispatched batch sizes.
* Results are exactly the single-sample computation: the Predictor pads
  ragged tails and strips padding rows before returning, so batch
  composition never changes a client's numbers.
* A device/model failure is delivered to every future in the affected
  batch; the server keeps serving subsequent batches.
* Submissions are shape/dtype-validated against the first accepted
  sample, so one malformed request fails fast at ``submit`` instead of
  poisoning a whole batch.
* Host-memory bound (MEASURED, tools/bench_soak.py / BENCH_soak_r05):
  on the axon remote-TPU rig the client retains host memory for every
  BYTE SHIPPED — a 90 s soak at 5 vol/s of 7.2 MB volumes grew RSS by
  7.07 MB/request (= the sample size) in plain mode AND 7.15 with the
  ``staging_slots`` recycled-host-buffer ring (0 fallbacks), so the
  retention is per-transfer, not per-host-buffer, and no client-side
  pooling can remove it. Operational bound: RSS grows ~= request_rate
  x sample_bytes (2.0 GB/min at 5 vol/s x 7.2 MB); budget accordingly
  — e.g. a 100 GB allowance sustains ~14k volume requests, then
  recycle the serving process. Submitting float16 samples halves the
  rate (metric-neutral for this model family — the f16 cache quality
  evidence, tests/test_dataset.py). ``staging_slots`` remains useful
  for its original purposes — bounded allocation on slow-fresh-alloc
  VMs and deterministic buffer reuse — and is harmless elsewhere.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional

import numpy as np


class BatchingServer:
    def __init__(self, predictor, max_wait_s: float = 0.005,
                 name: str = "serve"):
        self.predictor = predictor
        self.max_wait_s = float(max_wait_s)
        self._q: queue.Queue = queue.Queue()
        self._spec: Optional[dict] = None  # key -> (shape, dtype)
        self._spec_lock = threading.Lock()
        # Serializes the closed-check+enqueue against close()'s
        # closed-set+sentinel: without it a submit that passed the check
        # could land behind the sentinel and its future would never
        # resolve.
        self._submit_lock = threading.Lock()
        self._closed = False
        self.batches_served = 0
        self.samples_served = 0
        self.batch_histogram: dict = {}  # dispatched batch size -> count
        self._worker = threading.Thread(target=self._loop, name=name,
                                        daemon=True)
        self._worker.start()

    # -- client side ---------------------------------------------------
    def submit(self, sample: dict) -> Future:
        """Enqueue one sample (dict of arrays WITHOUT a batch axis).

        Returns a Future resolving to ``{'logits': (C,), 'probs': (C,),
        'embeddings': {tap: (...)}}`` for this sample alone.
        """
        if self._closed:  # fast-fail before paying the staging copy
            raise RuntimeError("server is closed")
        sample = {k: np.asarray(v) for k, v in sample.items()}
        self._validate(sample)
        # Start the async H2D transfer NOW: it overlaps the batching
        # window, and the dispatch then moves zero sample bytes — only
        # real samples ever cross the host->device link (predict_parts
        # pads on device). Biggest effect where that link is slow
        # (remote-TPU tunnels: measured 8-16x less traffic per lone
        # request than host-side rung padding).
        staged = self.predictor.stage_sample(sample)
        future: Future = Future()
        with self._submit_lock:
            if self._closed:
                # closed between the fast check and here: return the
                # staged slot to the pool before rejecting, or the ring
                # drains one slot per raced submit
                release = getattr(staged, "release", None)
                if release is not None:
                    release()
                raise RuntimeError("server is closed")
            self._q.put((staged, future))
        return future

    def _validate(self, sample: dict) -> None:
        spec = {k: (v.shape, v.dtype) for k, v in sample.items()}
        with self._spec_lock:
            if self._spec is None:
                self._spec = spec
                return
            if set(spec) != set(self._spec):
                raise ValueError(
                    f"sample keys {sorted(spec)} != served keys "
                    f"{sorted(self._spec)}")
            for k, (shape, dtype) in spec.items():
                want_shape, want_dtype = self._spec[k]
                if shape != want_shape or dtype != want_dtype:
                    raise ValueError(
                        f"sample['{k}'] is {shape}/{dtype}, server is "
                        f"committed to {want_shape}/{want_dtype}")

    def close(self, drain: bool = True) -> None:
        """Stop accepting work; by default serve what's already queued."""
        with self._submit_lock:
            already = self._closed
            self._closed = True
            if not already:
                if not drain:
                    try:
                        while True:
                            staged, future = self._q.get_nowait()
                            release = getattr(staged, "release", None)
                            if release is not None:
                                release()
                            if future.set_running_or_notify_cancel():
                                future.set_exception(
                                    RuntimeError("server closed"))
                    except queue.Empty:
                        pass
                self._q.put(None)  # sentinel wakes the worker
        self._worker.join()
        # Release the shape/dtype spec the first sample committed us to:
        # a closed server holds no queue, so keeping the commitment only
        # pins stale state (and misleads anyone inspecting the object).
        with self._spec_lock:
            self._spec = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- server side ---------------------------------------------------
    def _loop(self) -> None:
        batch_size = self.predictor.batch_size
        while True:
            item = self._q.get()
            if item is None:
                return
            pending = [item]
            deadline = time.monotonic() + self.max_wait_s
            while len(pending) < batch_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=remaining)
                except queue.Empty:
                    break
                if nxt is None:
                    self._serve(pending)
                    return
                pending.append(nxt)
            self._serve(pending)

    def _serve(self, pending: list) -> None:
        # Claim each future before computing: a client may have cancelled
        # a queued request (e.g. its own timeout) — set_result on a
        # cancelled future raises InvalidStateError and would kill the
        # worker loop for good. Claimed futures are RUNNING and can no
        # longer be cancelled, so the deliveries below cannot raise.
        claimed = []
        for s, f in pending:
            if f.set_running_or_notify_cancel():
                claimed.append((s, f))
            else:
                # cancelled request: its staged slot still holds a ring
                # buffer — release it or client timeouts drain the pool
                release = getattr(s, "release", None)
                if release is not None:
                    release()
        pending = claimed
        if not pending:
            return
        samples = [s for s, _ in pending]
        futures = [f for _, f in pending]
        try:
            self._serve_inner(samples, futures)
        finally:
            # Return pooled staging slots (predictor staging_slots > 0):
            # the batch is fully served — or failed — so every staged
            # transfer has completed and the host buffers are reusable.
            for s in samples:
                release = getattr(s, "release", None)
                if release is not None:
                    release()

    def _serve_inner(self, samples: list, futures: list) -> None:
        try:
            if getattr(self.predictor, "_shard", None) is None:
                # hot path: samples are device-staged; stack+pad runs on
                # device, the dispatch ships zero sample bytes
                out = self.predictor.predict_parts(samples)
            else:
                # mesh predictors place at batch level (sharded H2D)
                batch = {k: np.stack([np.asarray(s[k]) for s in samples])
                         for k in samples[0]}
                out = self.predictor.predict_batch(batch)
            # Per-sample results built inside the try: a serve core with
            # a different output shape (e.g. an exported artifact without
            # embedding taps) must fail this batch, not kill the worker.
            # 'embeddings' is optional — exported float/folded/int8
            # graphs return only {'logits', 'probs'}.
            results = [{
                "logits": out["logits"][i],
                "probs": out["probs"][i],
                "embeddings": {k: v[i]
                               for k, v in out.get("embeddings",
                                                   {}).items()},
            } for i in range(len(futures))]
        except Exception as e:  # model/device failure: fail this batch only
            for future in futures:
                future.set_exception(e)
            return
        self.batches_served += 1
        self.samples_served += len(futures)
        k = len(futures)
        self.batch_histogram[k] = self.batch_histogram.get(k, 0) + 1
        for future, result in zip(futures, results):
            future.set_result(result)
