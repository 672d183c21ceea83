"""Fréchet Video Distance with an Inception-v1 I3D feature extractor (flax).

Reference parity: FrechetVideoDistance (evaluation/fvd/torchmetrics_wrap.py:84),
InceptionI3d (pytorch_i3d.py:133), standalone frechet math (fvd/fvd.py:52-121).
The published Kinetics-400/600 I3D weights convert mechanically via
prediff_tpu.utils.convert (BatchNorm running stats map to flax batch_stats).

Channel-last (B, T, H, W, C) throughout; features double-precision accumulated
as streaming (sum, cov_sum, n) — mergeable across shards like the skill-score
state.
"""
import math
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct


def _same_pad_3d(x: jnp.ndarray, kernel, stride) -> jnp.ndarray:
    """TF-style dynamic SAME padding over (B, T, H, W, C)."""
    pads = [(0, 0)]
    for d, size in enumerate(x.shape[1:4]):
        if size % stride[d] == 0:
            pad = max(kernel[d] - stride[d], 0)
        else:
            pad = max(kernel[d] - (size % stride[d]), 0)
        pads.append((pad // 2, pad - pad // 2))
    pads.append((0, 0))
    return jnp.pad(x, pads)


class MaxPool3dSamePadding(nn.Module):
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x):
        x = _same_pad_3d(x, self.kernel_size, self.stride)
        return nn.max_pool(x, window_shape=self.kernel_size,
                           strides=self.stride, padding="VALID")


class Unit3D(nn.Module):
    output_channels: int
    kernel_shape: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_batch_norm: bool = True
    use_bias: bool = False
    use_activation: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _same_pad_3d(x, self.kernel_shape, self.stride)
        x = nn.Conv(self.output_channels, kernel_size=self.kernel_shape,
                    strides=self.stride, padding="VALID", use_bias=self.use_bias,
                    name="conv3d")(x)
        if self.use_batch_norm:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                             epsilon=1e-5, name="bn")(x)
        if self.use_activation:
            x = jax.nn.relu(x)
        return x


class InceptionModule(nn.Module):
    out_channels: Sequence[int]

    @nn.compact
    def __call__(self, x, train: bool = False):
        oc = self.out_channels
        b0 = Unit3D(oc[0], (1, 1, 1), name="b0")(x, train)
        b1 = Unit3D(oc[2], (3, 3, 3), name="b1b")(
            Unit3D(oc[1], (1, 1, 1), name="b1a")(x, train), train)
        b2 = Unit3D(oc[4], (3, 3, 3), name="b2b")(
            Unit3D(oc[3], (1, 1, 1), name="b2a")(x, train), train)
        b3 = Unit3D(oc[5], (1, 1, 1), name="b3b")(
            MaxPool3dSamePadding((3, 3, 3), (1, 1, 1), name="b3a")(x), train)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """Inception-v1 I3D over (B, T, H, W, 3) in [-1, 1]; returns per-video
    logits (B, num_classes) (time-averaged, spatially squeezed)."""

    num_classes: int = 400
    dropout_keep_prob: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Unit3D(64, (7, 7, 7), stride=(2, 2, 2), name="Conv3d_1a_7x7")(x, train)
        x = MaxPool3dSamePadding((1, 3, 3), (1, 2, 2), name="MaxPool3d_2a_3x3")(x)
        x = Unit3D(64, (1, 1, 1), name="Conv3d_2b_1x1")(x, train)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x, train)
        x = MaxPool3dSamePadding((1, 3, 3), (1, 2, 2), name="MaxPool3d_3a_3x3")(x)
        x = InceptionModule((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x, train)
        x = InceptionModule((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x, train)
        x = MaxPool3dSamePadding((3, 3, 3), (2, 2, 2), name="MaxPool3d_4a_3x3")(x)
        x = InceptionModule((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x, train)
        x = InceptionModule((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x, train)
        x = InceptionModule((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x, train)
        x = InceptionModule((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x, train)
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x, train)
        x = MaxPool3dSamePadding((2, 2, 2), (2, 2, 2), name="MaxPool3d_5a_2x2")(x)
        x = InceptionModule((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x, train)
        x = InceptionModule((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x, train)
        # head: avg_pool (2,7,7) stride 1 VALID -> logits conv -> squeeze -> mean T
        # window clamps to the feature map so sub-224 / short-T inputs remain
        # usable (identical to the reference at its designed 224x224, T>=9,
        # where the features are exactly (T', 7, 7); the torch version errors)
        window = tuple(min(k, s) for k, s in zip((2, 7, 7), x.shape[1:4]))
        x = nn.avg_pool(x, window_shape=window, strides=(1, 1, 1), padding="VALID")
        x = Unit3D(self.num_classes, (1, 1, 1), use_batch_norm=False,
                   use_bias=True, use_activation=False, name="logits")(x, train)
        x = x.squeeze(3).squeeze(2)  # (B, T', C)
        return x.mean(axis=1)


def preprocess_video(video: jnp.ndarray, target_resolution: int = 224) -> jnp.ndarray:
    """(B, T, H, W, C) in [0,1] -> resized/center-cropped, [-1, 1]
    (parity: I3DWrapper.preprocess, torchmetrics_wrap.py:33-62)."""
    B, T, H, W, C = video.shape
    scale = target_resolution / min(H, W)
    if H < W:
        th, tw = target_resolution, math.ceil(W * scale)
    else:
        th, tw = math.ceil(H * scale), target_resolution
    frames = video.reshape(B * T, H, W, C)
    frames = jax.image.resize(frames, (B * T, th, tw, C), method="bilinear")
    h0 = (th - target_resolution) // 2
    w0 = (tw - target_resolution) // 2
    frames = frames[:, h0:h0 + target_resolution, w0:w0 + target_resolution]
    frames = frames.reshape(B, T, target_resolution, target_resolution, C)
    return (frames - 0.5) * 2.0


@struct.dataclass
class FVDState:
    features_sum: jnp.ndarray      # (d,) float64-ish accumulator (fp32 on TPU)
    features_cov_sum: jnp.ndarray  # (d, d)
    num_samples: jnp.ndarray       # ()

    @classmethod
    def zeros(cls, d: int, dtype=jnp.float32):
        return cls(
            features_sum=jnp.zeros((d,), dtype),
            features_cov_sum=jnp.zeros((d, d), dtype),
            num_samples=jnp.zeros((), jnp.int32),
        )

    def update(self, features: jnp.ndarray) -> "FVDState":
        return FVDState(
            features_sum=self.features_sum + features.sum(axis=0),
            features_cov_sum=self.features_cov_sum + features.T @ features,
            num_samples=self.num_samples + features.shape[0],
        )

    def merge(self, other: "FVDState") -> "FVDState":
        return FVDState(
            features_sum=self.features_sum + other.features_sum,
            features_cov_sum=self.features_cov_sum + other.features_cov_sum,
            num_samples=self.num_samples + other.num_samples,
        )

    def mean_cov(self):
        n = float(self.num_samples)
        mean = np.asarray(self.features_sum, np.float64) / n
        cov = (
            np.asarray(self.features_cov_sum, np.float64) - n * np.outer(mean, mean)
        ) / (n - 1)
        return mean, cov


def _sym_matrix_sqrt(mat: np.ndarray, eps: float = 1e-10) -> np.ndarray:
    u, s, vt = np.linalg.svd(mat)
    si = np.where(s < eps, s, np.sqrt(s))
    return u @ np.diag(si) @ vt


def frechet_distance_from_moments(m1, c1, m2, c2) -> float:
    sqrt_c1 = _sym_matrix_sqrt(c1)
    inner = _sym_matrix_sqrt(sqrt_c1 @ c2 @ sqrt_c1)
    trace = np.trace(c1 + c2) - 2.0 * np.trace(inner)
    return float(trace + np.sum((m1 - m2) ** 2))


def frechet_distance(x1: np.ndarray, x2: np.ndarray) -> float:
    """FVD between two (N, d) feature batches (parity: fvd/fvd.py:101-112)."""
    x1 = np.asarray(x1, np.float64).reshape(len(x1), -1)
    x2 = np.asarray(x2, np.float64).reshape(len(x2), -1)
    m1, m2 = x1.mean(0), x2.mean(0)
    c1 = np.cov(x1, rowvar=False)
    c2 = np.cov(x2, rowvar=False)
    return frechet_distance_from_moments(m1, c1, m2, c2)


class FrechetVideoDistance:
    """Streaming FVD: update(videos, real=...) -> compute().

    videos: (B, T, H, W, C) in [0, 1] (or 0-255 with normalize=True); C=1 is
    tiled to 3; T < 9 repeat-interleaved when auto_t (ref :224-233)."""

    min_t = 9

    def __init__(self, feature_fn=None, num_features: int = 400,
                 i3d_params=None, reset_real_features: bool = True,
                 normalize: bool = False, auto_t: bool = False,
                 target_resolution: int = 224):
        if feature_fn is None:
            model = InceptionI3d(num_classes=num_features)
            assert i3d_params is not None, (
                "provide converted I3D params ({'params':..., 'batch_stats':...}) "
                "or a custom feature_fn"
            )
            def feature_fn(videos):
                return model.apply(
                    i3d_params, preprocess_video(videos, target_resolution),
                    train=False,
                )
            feature_fn = jax.jit(feature_fn)
        # user-supplied feature_fns are used as-is so several metric instances
        # (aligned/unaligned suites) can share one compiled extractor
        self.feature_fn = feature_fn
        self.num_features = num_features
        self.reset_real_features = reset_real_features
        self.normalize = normalize
        self.auto_t = auto_t
        self.real = FVDState.zeros(num_features)
        self.fake = FVDState.zeros(num_features)

    def update(self, videos: jnp.ndarray, real: bool):
        if videos.shape[1] < self.min_t:
            if not self.auto_t:
                raise ValueError(
                    f"temporal length {videos.shape[1]} < {self.min_t}; "
                    "set auto_t=True to repeat-interleave"
                )
            # repeat-interleave until >= min_t (ref :224-233 repeats once,
            # which is the same factor for every T in [5, 9); shorter inputs
            # would crash the reference's pooling)
            reps = -(-self.min_t // videos.shape[1])
            videos = jnp.repeat(videos, reps, axis=1)
        if self.normalize:
            videos = videos / 255.0
        if videos.shape[-1] == 1:
            videos = jnp.tile(videos, (1, 1, 1, 1, 3))
        features = self.feature_fn(videos)
        if real:
            self.real = self.real.update(features)
        else:
            self.fake = self.fake.update(features)

    def compute(self) -> float:
        m_r, c_r = self.real.mean_cov()
        m_f, c_f = self.fake.mean_cov()
        return frechet_distance_from_moments(m_r, c_r, m_f, c_f)

    def reset(self):
        self.fake = FVDState.zeros(self.num_features)
        if self.reset_real_features:
            self.real = FVDState.zeros(self.num_features)
