"""Training-loop scaffolding + checkpoint I/O tests."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from prediff_tpu.training.loop import fit, MetricLogger, EarlyStopper, CheckpointTracker
from prediff_tpu.training.train_state import EmaTrainState
from prediff_tpu.utils.checkpoint import (
    save_checkpoint,
    restore_checkpoint,
    save_params_npz,
    load_params_npz,
)


def _make_state():
    params = {"w": jnp.asarray([1.0, 2.0]), "b": jnp.asarray(0.5)}
    tx = optax.sgd(0.1)
    return EmaTrainState.create(params, tx, use_ema=True)


def test_fit_loop_runs_and_checkpoints(tmp_path):
    state = _make_state()

    def train_step(state, rng, x):
        def loss_fn(p):
            return jnp.mean((x @ p["w"] + p["b"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"train/loss": loss}

    def batches(epoch):
        rng = np.random.RandomState(epoch)
        for _ in range(4):
            yield jnp.asarray(rng.randn(8, 2).astype(np.float32))

    def val_fn(state):
        return {"val/loss": float(jnp.sum(jnp.abs(state.params["w"])))}

    out = fit(
        state=state,
        train_step=jax.jit(train_step),
        train_batches_fn=batches,
        make_batch_args=lambda b: (b,),
        max_epochs=3,
        save_dir=str(tmp_path),
        rng=jax.random.PRNGKey(0),
        val_fn=val_fn,
        check_val_every_n_epoch=1,
        monitor="val/loss",
        log_every_n_steps=1,
    )
    assert int(out.step) == 12
    assert os.path.exists(tmp_path / "metrics.jsonl")
    assert os.path.isdir(tmp_path / "ckpt")


def test_early_stopper():
    es = EarlyStopper(patience=2, mode="min", enabled=True)
    assert not es.should_stop(1.0)
    assert not es.should_stop(0.5)   # improvement
    assert not es.should_stop(0.6)   # 1
    assert not es.should_stop(0.7)   # 2
    assert es.should_stop(0.8)       # 3 > patience


def test_checkpoint_roundtrip(tmp_path):
    state = _make_state()
    state = state.replace(params={"w": jnp.asarray([5.0, 6.0]), "b": jnp.asarray(7.0)})
    path = str(tmp_path / "ck")
    save_checkpoint(path, state, step=3)
    restored = restore_checkpoint(path, _make_state())
    np.testing.assert_allclose(np.asarray(restored.params["w"]), [5.0, 6.0])
    np.testing.assert_allclose(float(restored.params["b"]), 7.0)
    assert int(restored.step) == 0  # step is part of the saved tree (zeros here)


def test_params_npz_roundtrip(tmp_path):
    params = {"a": {"kernel": np.random.RandomState(0).randn(3, 4)},
              "b": {"nested": {"bias": np.ones(5)}}}
    path = str(tmp_path / "p.npz")
    save_params_npz(path, params)
    loaded = load_params_npz(path)
    np.testing.assert_allclose(loaded["a"]["kernel"], params["a"]["kernel"])
    np.testing.assert_allclose(loaded["b"]["nested"]["bias"], np.ones(5))
