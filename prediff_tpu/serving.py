"""High-level serving API: load weights once, produce (ensemble) forecasts.

The one-stop replacement for a reference user's inference workflow
(train_sevirlr_prediff.py --test / sample paths), suitable for production
serving: everything jitted and cached per batch shape, ensembles batched
across the device mesh.
"""
from typing import Dict, Optional, Union

import numpy as np
import jax
import jax.numpy as jnp

from .config import ConfigDict, prediff_default_config
from .factory import build_pipeline
from .utils.checkpoint import load_params_npz, load_pretrained_torch, PRETRAINED_NAMES


class PreDiffPredictor:
    """Probabilistic SEVIR-LR nowcaster.

    >>> predictor = PreDiffPredictor.from_npz("weights/")     # converted ckpts
    >>> forecast = predictor.predict(context)                  # (B,6,128,128,1)
    >>> ens = predictor.predict_ensemble(context, num_samples=8)
    """

    def __init__(self, cfg: Optional[ConfigDict] = None, params: Optional[Dict] = None,
                 with_alignment: bool = True, seed: int = 0,
                 compute_dtype: str = "float32", mesh="auto"):
        """``mesh='auto'``: on multi-device hosts, shard sampling over a
        data mesh via shard_map (per-device pallas kernel launches); pass an
        explicit Mesh or None to override."""
        self.cfg = cfg or prediff_default_config()
        self.ld, self.params = build_pipeline(
            self.cfg, rng=jax.random.PRNGKey(seed), with_alignment=with_alignment,
            **{k: v for k, v in (params or {}).items()
               if k in ("unet_params", "vae_params", "align_params")},
        )
        self.with_alignment = with_alignment
        self.compute_dtype = compute_dtype
        if mesh == "auto":
            from .parallel.mesh import make_mesh
            mesh = make_mesh() if len(jax.devices()) > 1 else None
        self.mesh = mesh
        self._rng = jax.random.PRNGKey(seed)

    # ------------------------------------------------------------ #
    @classmethod
    def from_npz(cls, weights_dir: str, cfg: Optional[ConfigDict] = None,
                 with_alignment: bool = True, **kw) -> "PreDiffPredictor":
        """Load from scripts/convert_pretrained.py output."""
        import os

        params = {}
        mapping = {"unet_params": "earthformerunet.npz", "vae_params": "vae.npz",
                   "align_params": "alignment.npz"}
        for key, fname in mapping.items():
            path = os.path.join(weights_dir, fname)
            if os.path.exists(path):
                params[key] = load_params_npz(path)
        return cls(cfg=cfg, params=params, with_alignment=with_alignment, **kw)

    @classmethod
    def from_torch(cls, pt_dir: str, cfg: Optional[ConfigDict] = None,
                   with_alignment: bool = True, **kw) -> "PreDiffPredictor":
        """Load the reference's published .pt weights directly."""
        import os

        self = cls(cfg=cfg, with_alignment=with_alignment, **kw)
        self.params["vae"] = load_pretrained_torch(
            os.path.join(pt_dir, PRETRAINED_NAMES["vae"]), self.params["vae"])
        self.params["unet"] = load_pretrained_torch(
            os.path.join(pt_dir, PRETRAINED_NAMES["earthformerunet"]),
            self.params["unet"])
        if with_alignment and "align" in self.params:
            self.params["align"] = load_pretrained_torch(
                os.path.join(pt_dir, PRETRAINED_NAMES["alignment"]),
                self.params["align"])
            self.ld.alignment = self.ld.alignment.replace(params=self.params["align"])
        return self

    # ------------------------------------------------------------ #
    def _next_rng(self, rng):
        if rng is not None:
            return rng
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def predict(
        self,
        context: Union[np.ndarray, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        use_alignment: bool = False,
        avg_x_gt: Optional[jnp.ndarray] = None,
        ddim_steps: Optional[int] = None,
        timesteps: Optional[int] = None,
        guidance_every_k: int = 1,
    ) -> jnp.ndarray:
        """One forecast per context: (B, T_in, H, W, C) -> (B, T_out, H, W, C).

        ``use_alignment`` steers toward ``avg_x_gt`` (anticipated mean
        intensity, shape (B, 1))."""
        y = jnp.asarray(context)
        kw = dict(compute_dtype=self.compute_dtype, mesh=self.mesh)
        if ddim_steps:
            kw.update(sampler="ddim", ddim_steps=ddim_steps)
        if timesteps:
            kw["timesteps"] = timesteps
        if use_alignment:
            assert self.with_alignment and avg_x_gt is not None
            kw.update(use_alignment=True,
                      alignment_kwargs={"avg_x_gt": jnp.asarray(avg_x_gt)},
                      guidance_every_k=guidance_every_k)
        return self.ld.sample(self.params["unet"], self.params["vae"],
                              self._next_rng(rng), y, **kw)

    def predict_ensemble(
        self,
        context: Union[np.ndarray, jnp.ndarray],
        num_samples: int = 8,
        rng: Optional[jax.Array] = None,
        **kwargs,
    ) -> jnp.ndarray:
        """(num_samples, B, T_out, H, W, C); members batch across the mesh."""
        y = jnp.asarray(context)
        kw = dict(compute_dtype=self.compute_dtype, mesh=self.mesh)
        if kwargs.get("ddim_steps"):
            kw.update(sampler="ddim", ddim_steps=kwargs["ddim_steps"])
        if kwargs.get("timesteps"):
            kw["timesteps"] = kwargs["timesteps"]
        if kwargs.get("use_alignment"):
            kw.update(use_alignment=True,
                      alignment_kwargs={"avg_x_gt": jnp.asarray(kwargs["avg_x_gt"])},
                      guidance_every_k=kwargs.get("guidance_every_k", 1))
        return self.ld.sample_ensemble(
            self.params["unet"], self.params["vae"], self._next_rng(rng), y,
            num_samples=num_samples, **kw,
        )
