"""Diagonal Gaussian posterior (ref: src/prediff/utils/distributions.py:26).

Channel-last: ``parameters`` is (..., 2*C) with mean/logvar split on the last
axis (the torch reference splits on the channel-first axis 1).
"""
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class DiagonalGaussianDistribution:
    mean: jnp.ndarray
    logvar: jnp.ndarray

    @classmethod
    def from_parameters(cls, parameters: jnp.ndarray, clip=( -30.0, 20.0)):
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        logvar = jnp.clip(logvar, clip[0], clip[1])
        return cls(mean=mean, logvar=logvar)

    @property
    def std(self):
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self):
        return jnp.exp(self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussianDistribution"] = None,
           reduce_axes=(1, 2, 3)) -> jnp.ndarray:
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=reduce_axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=reduce_axes,
        )

    def nll(self, sample: jnp.ndarray, reduce_axes=(1, 2, 3)) -> jnp.ndarray:
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=reduce_axes,
        )


def latents_from_moments_seq(
    moments: jnp.ndarray,
    rng=None,
    sample_posterior: bool = False,
    scale_factor: float = 1.0,
) -> jnp.ndarray:
    """Cached encoder moments (B, T, h, w, 2c) -> scaled latent seq
    (B, T, h, w, c): frame-flattened posterior sample (or mode), then
    ``scale_factor`` — the single shared tail of the first-stage encode used
    by both LatentDiffusion and AlignmentTrainer when training from a latent
    cache (datasets/latents.py).  The flatten/sample order mirrors
    ``encode_first_stage`` exactly so cached and pixel-input steps match
    bit-for-bit given the same rng (and encode dtype)."""
    B = moments.shape[0]
    frames = moments.astype(jnp.float32).reshape((-1,) + moments.shape[2:])
    posterior = DiagonalGaussianDistribution.from_parameters(frames)
    z = posterior.sample(rng) if sample_posterior else posterior.mode()
    z = scale_factor * z
    return z.reshape((B, -1) + z.shape[1:])
