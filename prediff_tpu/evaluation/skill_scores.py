"""SEVIR skill scores (CSI/POD/SUCR/BIAS) as a functional accumulator.

Reference parity: SEVIRSkillScore (src/prediff/datasets/sevir/evaluation.py:88).
The torchmetrics Metric's (hits, misses, fas) states with dist_reduce_fx="sum"
become a plain pytree of counters; multi-device reduction is a jnp sum of
per-shard states (or automatic under jit with sharded inputs).

Modes:
  "0": counts pooled over all pixels; scores per threshold + threshold-avg
  "1": per-lead-time counts; scores keep the (seq_len,) dim
  "2": per-lead-time counts; scores averaged over lead time at compute()
``preprocess_type="sevir_pool{x}"`` max-pools pred/target by x before
thresholding (ref :219-237).
"""
import re
from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


def _rescale_to_255(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] VIL back to 0-255 (ref: process_data_dict_back with '01')."""
    return x * 255.0


def _max_pool_hw(x: jnp.ndarray, scale: int, layout: str) -> jnp.ndarray:
    h_axis, w_axis = layout.find("H"), layout.find("W")
    H, W = x.shape[h_axis], x.shape[w_axis]
    n_h, n_w = H // scale, W // scale
    x = jax.lax.slice_in_dim(x, 0, n_h * scale, axis=h_axis)
    x = jax.lax.slice_in_dim(x, 0, n_w * scale, axis=w_axis)
    shape = list(x.shape)
    shape[h_axis:h_axis + 1] = [n_h, scale]
    x = x.reshape(shape).max(axis=h_axis + 1)
    shape = list(x.shape)
    shape[w_axis:w_axis + 1] = [n_w, scale]
    return x.reshape(shape).max(axis=w_axis + 1)


def threshold_counts(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    thresholds: Sequence[float],
    reduce_dims: Tuple[int, ...],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """hits/misses/false-alarms per threshold; NaNs count as 0 (ref :12-44).

    Returns arrays of shape (num_thresholds, *kept_dims)."""
    is_nan = jnp.logical_or(jnp.isnan(pred), jnp.isnan(target))
    th = jnp.asarray(thresholds, pred.dtype).reshape(
        (-1,) + (1,) * pred.ndim
    )
    t = jnp.where(is_nan[None], 0.0, (target[None] >= th).astype(jnp.float32))
    p = jnp.where(is_nan[None], 0.0, (pred[None] >= th).astype(jnp.float32))
    axes = tuple(d + 1 for d in reduce_dims)
    hits = jnp.sum(t * p, axis=axes)
    misses = jnp.sum(t * (1 - p), axis=axes)
    fas = jnp.sum((1 - t) * p, axis=axes)
    return hits, misses, fas


@struct.dataclass
class SkillScoreState:
    hits: jnp.ndarray
    misses: jnp.ndarray
    fas: jnp.ndarray

    def merge(self, other: "SkillScoreState") -> "SkillScoreState":
        return SkillScoreState(
            hits=self.hits + other.hits,
            misses=self.misses + other.misses,
            fas=self.fas + other.fas,
        )


class SEVIRSkillScore:
    def __init__(
        self,
        layout: str = "NTHWC",
        mode: str = "0",
        seq_len: Optional[int] = None,
        preprocess_type: str = "sevir",
        threshold_list: Sequence[int] = (16, 74, 133, 160, 181, 219),
        metrics_list: Sequence[str] = ("csi", "bias", "sucr", "pod"),
        eps: float = 1e-4,
    ):
        assert preprocess_type == "sevir" or preprocess_type.startswith("sevir_pool")
        assert mode in ("0", "1", "2")
        self.layout = layout
        self.mode = mode
        self.seq_len = seq_len
        self.preprocess_type = preprocess_type
        self.threshold_list = tuple(threshold_list)
        self.metrics_list = tuple(metrics_list)
        self.eps = eps
        self.keep_seq_len_dim = mode in ("1", "2")
        if self.keep_seq_len_dim:
            assert isinstance(seq_len, int)
        t_axis = layout.find("T")
        dims = list(range(len(layout)))
        if self.keep_seq_len_dim:
            dims.pop(t_axis)
        self.reduce_dims = tuple(dims)
        self._update = jax.jit(self._update_impl)
        self.reset()

    def init_state(self) -> SkillScoreState:
        shape = (
            (len(self.threshold_list), self.seq_len)
            if self.keep_seq_len_dim else (len(self.threshold_list),)
        )
        z = jnp.zeros(shape, jnp.float32)
        return SkillScoreState(hits=z, misses=z, fas=z)

    def reset(self):
        self.state = self.init_state()

    def _update_impl(self, state: SkillScoreState, pred, target) -> SkillScoreState:
        pred = _rescale_to_255(pred)
        target = _rescale_to_255(target)
        if self.preprocess_type.startswith("sevir_pool"):
            scale = int(re.search(r"\d+", self.preprocess_type).group())
            pred = _max_pool_hw(pred, scale, self.layout)
            target = _max_pool_hw(target, scale, self.layout)
        hits, misses, fas = threshold_counts(
            pred, target, self.threshold_list, self.reduce_dims
        )
        return state.merge(SkillScoreState(hits=hits, misses=misses, fas=fas))

    def update(self, pred: jnp.ndarray, target: jnp.ndarray):
        """pred/target in [0, 1] VIL scale, layout = self.layout."""
        self.state = self._update(self.state, pred, target)

    # score functions -------------------------------------------------- #
    @staticmethod
    def pod(h, m, f, eps):
        return h / (h + m + eps)

    @staticmethod
    def sucr(h, m, f, eps):
        return h / (h + f + eps)

    @staticmethod
    def csi(h, m, f, eps):
        return h / (h + m + f + eps)

    @staticmethod
    def bias(h, m, f, eps):
        bias = (h + f) / (h + m + eps)
        return np.power(bias / np.log(2.0), 2.0)

    def compute(self, state: Optional[SkillScoreState] = None) -> Dict:
        state = state if state is not None else self.state
        fns = {"pod": self.pod, "csi": self.csi, "sucr": self.sucr, "bias": self.bias}
        hits = np.asarray(state.hits)
        misses = np.asarray(state.misses)
        fas = np.asarray(state.fas)
        ret: Dict = {th: {} for th in self.threshold_list}
        ret["avg"] = {}
        for metric in self.metrics_list:
            scores = fns[metric](hits, misses, fas, self.eps)
            score_avg = np.zeros((self.seq_len,)) if self.keep_seq_len_dim else 0.0
            for i, th in enumerate(self.threshold_list):
                score = scores[i] if self.keep_seq_len_dim else float(scores[i])
                if self.mode in ("0", "1"):
                    ret[th][metric] = score
                else:  # "2"
                    ret[th][metric] = float(np.mean(score))
                score_avg += score
            score_avg /= len(self.threshold_list)
            ret["avg"][metric] = (
                float(np.mean(score_avg)) if self.mode == "2" else score_avg
            )
        return ret
