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


def _ckpt_steps(path):
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(path)) as m:
        return sorted(m.all_steps())


@pytest.mark.parametrize("mode", ["min", "max"])
def test_checkpoint_tracker_topk_by_score(tmp_path, mode):
    """Retention is by monitored score, not recency: the best checkpoint must
    survive later, worse improvements (the round-2 max_to_keep regression)."""
    tracker = CheckpointTracker(str(tmp_path), mode=mode, save_top_k=2)
    state = _make_state()
    # scores chosen so the BEST arrives first, then two worse improvements
    seq = [0.1, 0.5, 0.3] if mode == "min" else [0.9, 0.5, 0.7]
    # top-2 after all updates: {0.1, 0.3} (min) / {0.9, 0.7} (max)
    for i, s in enumerate(seq):
        # every entry here fills or improves the top-k
        if tracker.is_improvement(s):
            tracker.update(s, step=i, state=state)
    kept = _ckpt_steps(tmp_path / "ckpt")
    assert kept == [0, 2], kept  # step 1 (worst) evicted, best (step 0) kept
    assert [st for _, st in tracker.best] == [0, 2]


@pytest.mark.parametrize("mode", ["min", "max"])
def test_checkpoint_tracker_is_improvement_modes(mode):
    tracker = CheckpointTracker("/tmp/unused", mode=mode, save_top_k=2)
    fill = [1.0, 2.0]
    tracker.best = sorted(((s, i) for i, s in enumerate(fill)),
                          key=tracker._sort_key)
    if mode == "min":
        assert tracker.is_improvement(1.5)       # beats worst kept (2.0)
        assert not tracker.is_improvement(2.5)
        assert not tracker.is_improvement(2.0)   # ties don't improve
    else:
        assert tracker.is_improvement(1.5)       # beats worst kept (1.0)
        assert not tracker.is_improvement(0.5)
        assert not tracker.is_improvement(1.0)


def test_checkpoint_tracker_keeps_latest(tmp_path):
    """The most recent checkpoint survives even when outside top-k (resume
    parity with Lightning save_last)."""
    tracker = CheckpointTracker(str(tmp_path), mode="min", save_top_k=1)
    state = _make_state()
    tracker.update(0.1, step=0, state=state)
    tracker.update(0.5, step=1, state=state)   # worse but latest -> kept
    assert _ckpt_steps(tmp_path / "ckpt") == [0, 1]
    tracker.update(0.4, step=2, state=state)   # step 1 now neither best nor latest
    assert _ckpt_steps(tmp_path / "ckpt") == [0, 2]


def test_fit_max_steps_runs_final_validation(tmp_path):
    """Hitting max_steps mid-epoch must still validate + checkpoint (round-2
    verdict: a step-capped run ended with no top-k checkpoint)."""
    state = _make_state()
    calls = []

    def train_step(state, rng, x):
        def loss_fn(p):
            return jnp.mean((x @ p["w"] + p["b"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"train/loss": loss}

    def batches(epoch):
        rng = np.random.RandomState(epoch)
        for _ in range(10):
            yield jnp.asarray(rng.randn(4, 2).astype(np.float32))

    def val_fn(state):
        calls.append(int(state.step))
        return {"val/loss": float(jnp.sum(jnp.abs(state.params["w"])))}

    out = fit(
        state=state,
        train_step=jax.jit(train_step),
        train_batches_fn=batches,
        make_batch_args=lambda b: (b,),
        max_epochs=100,
        save_dir=str(tmp_path),
        rng=jax.random.PRNGKey(0),
        val_fn=val_fn,
        check_val_every_n_epoch=7,  # would never trigger before max_steps
        monitor="val/loss",
        max_steps=3,
    )
    assert int(out.step) == 3
    assert calls == [3]  # exactly one validation, at the truncation point
    assert _ckpt_steps(tmp_path / "ckpt") == [3]


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


def test_metric_logger_wandb_gated_offline(tmp_path):
    """use_wandb on a host without the wandb package degrades silently to
    jsonl (+ the record is still written)."""
    lg = MetricLogger(str(tmp_path), use_wandb=True, run_name="t",
                      config={"a": 1})
    lg.log(3, {"loss": 1.5, "skipme": "str"})
    import json as _json

    rec = _json.loads(open(tmp_path / "metrics.jsonl").read().strip())
    assert rec["step"] == 3 and rec["loss"] == 1.5 and "skipme" not in rec


def test_fit_steps_per_call_scan_chunks(tmp_path):
    """fit(steps_per_call=K): K-stacked chunks dispatch through
    train_step_scan; global-step accounting, per-sub-step metric logging on
    the cadence, and equality with the K=1 loop over the same batches."""
    import json

    def single_step(state, rng, x):
        def loss_fn(p):
            return jnp.mean((x @ p["w"] + p["b"]) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"train/loss": loss}

    def scan_step(state, rng, xs):
        def body(st, x):
            return single_step(st, rng, x)

        return jax.lax.scan(body, state, xs)

    K = 2
    rng_np = np.random.RandomState(0)
    flat = [jnp.asarray(rng_np.randn(8, 2).astype(np.float32))
            for _ in range(8)]  # 2 epochs x 4 batches

    def batches_k1(epoch):
        yield from flat[epoch * 4:(epoch + 1) * 4]

    def batches_chunked(epoch):
        ep = flat[epoch * 4:(epoch + 1) * 4]
        for i in range(0, 4, K):
            yield jnp.stack(ep[i:i + K])

    d1, d2 = tmp_path / "k1", tmp_path / "k2"
    out1 = fit(
        state=_make_state(), train_step=jax.jit(single_step),
        train_batches_fn=batches_k1, make_batch_args=lambda b: (b,),
        max_epochs=2, save_dir=str(d1), rng=jax.random.PRNGKey(0),
        log_every_n_steps=3,
    )
    out2 = fit(
        state=_make_state(), train_step=jax.jit(single_step),
        train_step_scan=jax.jit(scan_step), steps_per_call=K,
        train_batches_fn=batches_chunked, make_batch_args=lambda b: (b,),
        max_epochs=2, save_dir=str(d2), rng=jax.random.PRNGKey(0),
        log_every_n_steps=3,
    )
    assert int(out1.step) == int(out2.step) == 8
    np.testing.assert_allclose(np.asarray(out2.params["w"]),
                               np.asarray(out1.params["w"]),
                               rtol=1e-6, atol=1e-8)
    # the chunked loop logs the SAME (step, loss) records as the K=1 loop
    recs1 = [json.loads(line) for line in open(d1 / "metrics.jsonl")]
    recs2 = [json.loads(line) for line in open(d2 / "metrics.jsonl")]
    steps1 = [r["step"] for r in recs1]
    steps2 = [r["step"] for r in recs2]
    assert steps1 == steps2 == [3, 6]
    for r1, r2 in zip(recs1, recs2):
        assert r1["train/loss"] == pytest.approx(r2["train/loss"], rel=1e-6)

    # steps_per_call > 1 without a scan fn is a clear error
    with pytest.raises(ValueError):
        fit(state=_make_state(), train_step=jax.jit(single_step),
            steps_per_call=2, train_batches_fn=batches_chunked,
            make_batch_args=lambda b: (b,), max_epochs=1,
            save_dir=str(tmp_path / "err"), rng=jax.random.PRNGKey(0))

    # max_steps rounds up to the chunk boundary (documented)
    out3 = fit(
        state=_make_state(), train_step=jax.jit(single_step),
        train_step_scan=jax.jit(scan_step), steps_per_call=K,
        train_batches_fn=batches_chunked, make_batch_args=lambda b: (b,),
        max_epochs=2, save_dir=str(tmp_path / "k3"),
        rng=jax.random.PRNGKey(0), max_steps=3,
    )
    assert int(out3.step) == 4
