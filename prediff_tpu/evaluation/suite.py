"""Forecast evaluation suite: the reference's per-split metric set
(SEVIRSkillScore + MSE/MAE/SSIM, plus CRPS and optional FVD) accumulated over
ensembles of sampled forecasts, with the reference's metric naming.

Reference parity: the valid_*/test_* torchmetric suites in
scripts/prediff/sevirlr/train_sevirlr_prediff.py — construction :219-269,
validation updates :813-899, test updates + FVD :905-969, epoch-end compute +
naming :983-1086 ("{prefix}_{metric}_{thresh}_epoch", "{prefix}_csi_avg_epoch",
"valid_loss_epoch" = -avg CSI :881-883).
"""
from typing import Dict, Optional, Sequence

import numpy as np
import jax.numpy as jnp

from .skill_scores import SEVIRSkillScore
from .metrics import MeanMetric, mse, mae, ssim, crps_ensemble
from .fvd import FrechetVideoDistance


class ForecastEvalSuite:
    """Accumulates one suite (aligned or unaligned) of forecast metrics.

    ``update`` takes an ensemble ``preds`` of shape (M, B, T, H, W, C) and the
    target (B, T, H, W, C): the skill score / MSE / MAE / SSIM are updated per
    member (matching the reference's per-sample update loop), FVD sees every
    member as fake and the target once as real, CRPS uses the whole ensemble.
    """

    def __init__(
        self,
        layout: str = "NTHWC",
        metrics_mode: str = "0",
        seq_len: Optional[int] = None,
        threshold_list: Sequence[int] = (16, 74, 133, 160, 181, 219),
        metrics_list: Sequence[str] = ("csi", "pod", "sucr", "bias"),
        fvd: Optional[FrechetVideoDistance] = None,
    ):
        self.score = SEVIRSkillScore(
            layout=layout, mode=metrics_mode, seq_len=seq_len,
            threshold_list=tuple(threshold_list),
            metrics_list=tuple(metrics_list),
        )
        self.threshold_list = tuple(threshold_list)
        self.metrics_list = tuple(metrics_list)
        self.mse = MeanMetric()
        self.mae = MeanMetric()
        self.ssim = MeanMetric()
        self.crps = MeanMetric()
        self.fvd = fvd

    def update(self, preds: jnp.ndarray, target: jnp.ndarray):
        assert preds.ndim == target.ndim + 1, (preds.shape, target.shape)
        for pred in preds:
            self.score.update(pred, target)
            # weight batch-mean scalars by their true element counts so ragged
            # final batches don't skew the epoch mean (torchmetrics semantics)
            n_el = int(np.prod(pred.shape))
            self.mse.update(mse(pred, target), weight=n_el)
            self.mae.update(mae(pred, target), weight=n_el)
            B, T = pred.shape[:2]
            self.ssim.update(
                ssim(pred.reshape((B * T,) + pred.shape[2:]),
                     target.reshape((B * T,) + target.shape[2:])),
                weight=B * T,  # torchmetrics SSIM: mean over images
            )
            if self.fvd is not None:
                self.fvd.update(pred, real=False)
        if self.fvd is not None:
            self.fvd.update(target, real=True)
        if preds.shape[0] > 1:
            self.crps.update(crps_ensemble(preds, target),
                             weight=int(np.prod(target.shape)))

    # ---- shard / cross-process reduction ------------------------------ #
    def merge(self, other: "ForecastEvalSuite"):
        """Sum the other suite's state into this one (all states are additive
        counts/sums — the reference's torchmetrics dist_reduce_fx='sum')."""
        self.score.state = self.score.state.merge(other.score.state)
        for mine, theirs in ((self.mse, other.mse), (self.mae, other.mae),
                             (self.ssim, other.ssim), (self.crps, other.crps)):
            mine.merge(theirs)
        if self.fvd is not None and other.fvd is not None:
            self.fvd.real = self.fvd.real.merge(other.fvd.real)
            self.fvd.fake = self.fvd.fake.merge(other.fvd.fake)
        return self

    def state_tree(self) -> Dict:
        """Additive numeric state as a flat pytree of numpy arrays."""
        tree = {
            "hits": np.asarray(self.score.state.hits),
            "misses": np.asarray(self.score.state.misses),
            "fas": np.asarray(self.score.state.fas),
            "mse": np.asarray([self.mse.total, self.mse.count]),
            "mae": np.asarray([self.mae.total, self.mae.count]),
            "ssim": np.asarray([self.ssim.total, self.ssim.count]),
            "crps": np.asarray([self.crps.total, self.crps.count]),
        }
        if self.fvd is not None:
            for name, st in (("real", self.fvd.real), ("fake", self.fvd.fake)):
                tree[f"fvd_{name}_sum"] = np.asarray(st.features_sum)
                tree[f"fvd_{name}_cov"] = np.asarray(st.features_cov_sum)
                tree[f"fvd_{name}_n"] = np.asarray(st.num_samples)
        return tree

    def load_state_tree(self, tree: Dict):
        from .skill_scores import SkillScoreState
        from .fvd import FVDState

        self.score.state = SkillScoreState(
            hits=jnp.asarray(tree["hits"]), misses=jnp.asarray(tree["misses"]),
            fas=jnp.asarray(tree["fas"]),
        )
        for name, m in (("mse", self.mse), ("mae", self.mae),
                        ("ssim", self.ssim), ("crps", self.crps)):
            m.total, m.count = float(tree[name][0]), float(tree[name][1])
        if self.fvd is not None and "fvd_real_sum" in tree:
            for name in ("real", "fake"):
                setattr(self.fvd, name, FVDState(
                    features_sum=jnp.asarray(tree[f"fvd_{name}_sum"]),
                    features_cov_sum=jnp.asarray(tree[f"fvd_{name}_cov"]),
                    num_samples=jnp.asarray(tree[f"fvd_{name}_n"]),
                ))

    def cross_process_reduce(self):
        """Sum metric state across all JAX processes before compute() — the
        reference reduces via torchmetrics sync_dist=True / dist_reduce_fx=
        'sum' (train_sevirlr_prediff.py:818-819, evaluation.py:155-163).
        No-op in single-process runs."""
        import jax

        if jax.process_count() == 1:
            return self
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(self.state_tree())
        summed = jax.tree_util.tree_map(
            lambda x: np.asarray(x).sum(axis=0), gathered
        )
        self.load_state_tree(summed)
        return self

    def compute(self, prefix: str) -> Dict[str, float]:
        """Epoch-end metrics in the reference's key scheme; also emits
        ``{prefix}_loss_epoch = -csi_avg`` (the checkpoint monitor)."""
        out: Dict[str, float] = {
            f"{prefix}_mse_epoch": self.mse.compute(),
            f"{prefix}_mae_epoch": self.mae.compute(),
            f"{prefix}_ssim_epoch": self.ssim.compute(),
        }
        scores = self.score.compute()
        for metric in self.metrics_list:
            for th in self.threshold_list:
                out[f"{prefix}_{metric}_{th}_epoch"] = float(
                    np.mean(scores[th][metric])
                )
            out[f"{prefix}_{metric}_avg_epoch"] = float(
                np.mean(scores["avg"][metric])
            )
        if "csi" in self.metrics_list:
            out[f"{prefix}_loss_epoch"] = -out[f"{prefix}_csi_avg_epoch"]
        if self.crps.count:
            out[f"{prefix}_crps_epoch"] = self.crps.compute()
        if self.fvd is not None:
            out[f"{prefix}_fvd_epoch"] = self.fvd.compute()
        return out

    def reset(self):
        self.score.reset()
        for m in (self.mse, self.mae, self.ssim, self.crps):
            m.reset()
        if self.fvd is not None:
            self.fvd.reset()
