"""Bounded host offload in the Trainer epoch loops.

The round-1 loop buffered every train logit of the epoch on device before
one end-of-epoch sync — fine at ADNI scale, unbounded at real scale. The
_HostAccumulator keeps at most `window` step outputs on device; metrics
must be bit-identical for any window.
"""

import numpy as np

import jax.numpy as jnp

from multimodal_alzheimer_tpu.train.loop import Trainer, _HostAccumulator


def test_accumulator_bounds_device_buffers_and_preserves_order():
    acc = _HostAccumulator(window=3)
    chunks = [jnp.arange(4) + 10 * i for i in range(8)]
    for c in chunks:
        acc.append(c)
        assert len(acc._pending) < 3  # flushed at the window boundary
    out = acc.concatenated()
    np.testing.assert_array_equal(
        out, np.concatenate([np.asarray(c) for c in chunks]))


def test_accumulator_scalar_values():
    acc = _HostAccumulator(window=2)
    for i in range(5):
        acc.append(jnp.float32(i) * 0.5)
    assert [float(v) for v in acc.values()] == [0.0, 0.5, 1.0, 1.5, 2.0]


def _epoch_metrics_with_window(window):
    import optax

    from multimodal_alzheimer_tpu.losses import make_criterion
    from multimodal_alzheimer_tpu.models import SmallPETCNN

    hparams = {"n_classes": 2, "conv_out": (2,), "filter_size": (3,),
               "linear_out": 4, "host_offload_every": window,
               "loss_class_weights": [0.5, 0.5]}
    model = SmallPETCNN.from_hparams(hparams)
    criterion = make_criterion(hparams)
    trainer = Trainer(model, hparams, optimizer=optax.adam(1e-3),
                      criterion=criterion, seed=7)

    rng = np.random.default_rng(0)
    batches = [{
        "pet1451": jnp.asarray(rng.normal(size=(4, 8, 8, 8))
                               .astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, 4), jnp.int32),
    } for _ in range(5)]

    state = trainer.init_state(batches[0])
    state, scalars, n = trainer._run_train_epoch(state, batches)
    return scalars, n


def test_train_epoch_metrics_identical_for_any_window():
    small, n1 = _epoch_metrics_with_window(1)
    large, n2 = _epoch_metrics_with_window(1000)
    assert n1 == n2 == 20
    assert small.keys() == large.keys()
    for k in small:
        assert small[k] == large[k], k
