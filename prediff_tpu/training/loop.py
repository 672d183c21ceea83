"""Generic training loop: epochs over a datamodule, periodic validation,
orbax checkpointing (top-k by monitor + save-last), jsonl metric logging,
early stopping — the TPU-native replacement for the reference's Lightning
Trainer + ModelCheckpoint/EarlyStopping callbacks (SURVEY.md §5)."""
import json
import os
import time
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np


class MetricLogger:
    """Append-only jsonl logger + optional TensorBoard + optional WandB.

    The reference attaches TensorBoardLogger/CSVLogger always and
    WandbLogger when ``logging.use_wandb`` (train_sevirlr_prediff.py:627-634);
    here jsonl is the always-on CSV equivalent and both extras are
    import-gated so offline hosts degrade silently."""

    def __init__(self, save_dir: str, use_tensorboard: bool = False,
                 use_wandb: bool = False, run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, "metrics.jsonl")
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter  # noqa

                self._tb = SummaryWriter(save_dir)
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb  # not in the baked image; gate, don't require

                self._wandb = wandb.init(
                    project=run_name or os.path.basename(save_dir) or "prediff",
                    dir=save_dir, config=config, resume="allow")
            except Exception:
                self._wandb = None

    def log(self, step: int, metrics: Dict[str, Any], prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, rec[key], step)
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in rec.items() if k != "step"}, step=rec["step"])
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


class CheckpointTracker:
    """save_top_k by a monitored metric + keep-the-latest (parity with
    Lightning ModelCheckpoint save_top_k/save_last semantics used by the
    reference, train_sevirlr_prediff.py:602-610).

    Retention is managed here by monitored score — NOT by orbax recency
    pruning — so the best checkpoint can never be evicted by later, worse
    improvements.  ``self.best`` stores raw (score, step) pairs sorted
    best-first for both modes."""

    def __init__(self, save_dir: str, monitor: str = "val/loss",
                 mode: str = "min", save_top_k: int = 3):
        assert mode in ("min", "max"), mode
        self.save_dir = save_dir
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.best: list = []  # (score, step), best first
        self.saved: set = set()  # steps currently on disk
        self.last_step: int = -1

    def _sort_key(self, entry):
        score, _ = entry
        return -score if self.mode == "max" else score

    def is_improvement(self, score: float) -> bool:
        if len(self.best) < self.save_top_k:
            return True
        worst = self.best[-1][0]
        return score < worst if self.mode == "min" else score > worst

    def update(self, score: float, step: int, state: Any):
        from ..utils.checkpoint import save_checkpoint, delete_checkpoint

        path = os.path.join(self.save_dir, "ckpt")
        save_checkpoint(path, state, step=step, keep=None)
        self.last_step = step
        self.best.append((float(score), step))
        self.best.sort(key=self._sort_key)
        self.best = self.best[: self.save_top_k]
        desired = {st for _, st in self.best} | {self.last_step}
        for st in sorted((self.saved | {step}) - desired):
            delete_checkpoint(path, st)
        self.saved = desired


class EarlyStopper:
    def __init__(self, patience: int = 100, mode: str = "min", enabled: bool = False):
        self.patience = patience
        self.mode = mode
        self.enabled = enabled
        self.best = np.inf if mode == "min" else -np.inf
        self.count = 0

    def should_stop(self, score: float) -> bool:
        if not self.enabled:
            return False
        improved = score < self.best if self.mode == "min" else score > self.best
        if improved:
            self.best = score
            self.count = 0
        else:
            self.count += 1
        return self.count > self.patience


def fit(
    state: Any,
    train_step: Callable,
    train_batches_fn: Callable[[int], Iterable],
    make_batch_args: Callable[[Any], tuple],
    max_epochs: int,
    save_dir: str,
    rng: jax.Array,
    val_fn: Optional[Callable[[Any], Dict[str, float]]] = None,
    check_val_every_n_epoch: int = 1,
    monitor: str = "val/loss",
    monitor_mode: str = "min",
    save_top_k: int = 3,
    early_stop: bool = False,
    early_stop_patience: int = 100,
    log_every_n_steps: int = 50,
    max_steps: Optional[int] = None,
    logger: Optional[MetricLogger] = None,
    train_step_scan: Optional[Callable] = None,
    steps_per_call: int = 1,
):
    """Run the loop; returns the final state.

    ``train_batches_fn(epoch)`` yields host batches; ``make_batch_args(batch)``
    maps a host batch to the positional args of ``train_step`` after
    ``(state, rng)``.

    ``steps_per_call=K`` (with ``train_step_scan`` from
    ``DiffusionTrainer.make_train_step_scan``) dispatches K optimizer steps
    per device call; ``train_batches_fn`` must then yield batches stacked
    ``(K, B, ...)`` on the leading axis (stack on the HOST, before the
    device transfer — an eager device-side stack would cost the very
    dispatch this mode removes).  Identical math to K sequential calls
    (tested).  Metrics come back stacked and are logged on the usual
    per-step cadence; ``max_steps`` rounds up to the chunk boundary."""
    logger = logger if logger is not None else MetricLogger(save_dir)
    tracker = CheckpointTracker(save_dir, monitor, monitor_mode, save_top_k)
    stopper = EarlyStopper(early_stop_patience, monitor_mode, early_stop)
    global_step = int(jax.device_get(state.step))
    last_val_step = None

    def run_validation():
        """Validate + top-k checkpoint; returns True when early-stopping."""
        nonlocal last_val_step
        val_metrics = val_fn(state)
        logger.log(global_step, val_metrics)
        last_val_step = global_step
        score = val_metrics.get(monitor)
        if score is not None:
            if tracker.is_improvement(score):
                tracker.update(score, global_step, state)
            if stopper.should_stop(score):
                return True
        return False

    K = max(int(steps_per_call), 1)
    use_scan = K > 1
    if use_scan and train_step_scan is None:
        raise ValueError("steps_per_call > 1 requires train_step_scan")

    stop = False
    for epoch in range(max_epochs):
        for batch in train_batches_fn(epoch):
            if use_scan:
                state, mets = train_step_scan(
                    state, rng, *make_batch_args(batch))
                base = global_step
                global_step += K
                if global_step // log_every_n_steps > base // log_every_n_steps:
                    host = jax.device_get(mets)  # some sub-step logs
                    for k in range(K):
                        if (base + k + 1) % log_every_n_steps == 0:
                            logger.log(base + k + 1,
                                       {m: v[k] for m, v in host.items()})
            else:
                state, metrics = train_step(state, rng, *make_batch_args(batch))
                global_step += 1
                if global_step % log_every_n_steps == 0:
                    logger.log(global_step, jax.device_get(metrics))
            if max_steps is not None and global_step >= max_steps:
                stop = True  # hit mid-epoch: final validation still runs below
                break
        if val_fn is not None and (stop or (epoch + 1) % check_val_every_n_epoch == 0):
            if run_validation():
                stop = True
        if stop:
            break
    # a run that ended on an off-cadence epoch (max_epochs exhausted between
    # validations) still gets a final validation + checkpoint
    if val_fn is not None and last_val_step != global_step and global_step > 0:
        run_validation()
    return state
