"""Latent diffusion pipeline: VAE latent space + Earthformer-UNet denoiser +
(optional) knowledge-alignment guidance, with the whole sampling chain
compiled as one jitted ``lax.scan``.

Reference parity: LatentDiffusion (src/prediff/diffusion/latent_diffusion.py:25).
The reference runs a Python loop of 1000 device round-trips per forecast
(:633-684); here the loop is a single compiled scan (per-step RNG via
``jax.random.fold_in``), alignment guidance is in-graph ``jax.grad``, and the
VAE decode is fused into the same jit.
"""
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.distributions import DiagonalGaussianDistribution
from ..utils.layout import parse_layout_shape
from .schedule import (
    GaussianSchedule,
    make_gaussian_schedule,
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
)
from . import core
from .knowledge_alignment import KnowledgeAlignment


class LatentDiffusion:
    """Functional orchestrator (not a Module): holds apply-fns + frozen params
    and compiles sampling/encoding pipelines on demand.

    Parameters mirror the reference constructor; ``first_stage`` is the VAE
    (always frozen, ref :319-328), ``cond_stage`` defaults to sharing it
    ("__is_first_stage__", ref :330-380)."""

    def __init__(
        self,
        unet_apply: Callable,
        vae_apply_encode: Callable,
        vae_apply_decode: Callable,
        schedule: Optional[GaussianSchedule] = None,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        given_betas=None,
        v_posterior: float = 0.0,
        parameterization: str = "eps",
        loss_type: str = "l2",
        l_simple_weight: float = 1.0,
        original_elbo_weight: float = 0.0,
        learn_logvar: bool = False,
        logvar_init: float = 0.0,
        layout: str = "NTHWC",
        data_shape: Sequence[int] = (6, 128, 128, 1),
        latent_shape: Sequence[int] = (6, 16, 16, 64),
        cond_latent_shape: Optional[Sequence[int]] = None,
        scale_factor: float = 1.0,
        clip_denoised: bool = False,
        log_every_t: int = 100,
        alignment: Optional[KnowledgeAlignment] = None,
        decode_chunk_size: Optional[int] = None,
        first_stage_dtype: str = "auto",
    ):
        assert parameterization in ("eps", "x0")
        self.unet_apply = unet_apply
        self.vae_apply_encode = vae_apply_encode
        self.vae_apply_decode = vae_apply_decode
        self.schedule = schedule or make_gaussian_schedule(
            beta_schedule=beta_schedule,
            timesteps=timesteps,
            linear_start=linear_start,
            linear_end=linear_end,
            cosine_s=cosine_s,
            given_betas=given_betas,
            v_posterior=v_posterior,
            parameterization=parameterization,
        )
        self.num_timesteps = self.schedule.num_timesteps
        self.parameterization = parameterization
        self.loss_type = loss_type
        self.l_simple_weight = l_simple_weight
        self.original_elbo_weight = original_elbo_weight
        self.learn_logvar = learn_logvar
        self.logvar_init = logvar_init
        self.layout = layout
        axes = parse_layout_shape(layout)
        assert axes["batch_axis"] == 0, "batch must lead (TPU sharding axis)"
        self.t_axis = axes["t_axis"]
        self.data_shape = tuple(data_shape)
        self.latent_shape = tuple(latent_shape)
        self.cond_latent_shape = tuple(cond_latent_shape or latent_shape)
        self.scale_factor = scale_factor
        self.clip_denoised = clip_denoised
        self.log_every_t = log_every_t
        self.alignment = alignment
        self.decode_chunk_size = decode_chunk_size
        # Compute dtype for the frozen VAE *encode* (training latents + the
        # sampling chain's conditioning encode).  The encoder works on
        # (B*T,128,128,C) pixel-space activations whose f32 HBM traffic
        # dominates its runtime (probe44: ~35 ms of the B=8 train step);
        # 'auto' casts activations+params to bf16 on real TPUs and returns
        # f32 moments (CPU/tests keep f32 → bit-identical).  Decode stays
        # f32: eval metrics are computed from its output.
        self.first_stage_dtype = first_stage_dtype
        self._jit_cache: Dict = {}

    def _resolved_first_stage_dtype(self, n_frames: Optional[int] = None):
        """'auto' = bf16 on real TPUs when the encoder batch is large enough
        to profit: +2% whole-step at the B=8 train shapes (104 frames,
        probe45) but ~-2% in the B=1 sampler chain (7 frames, probe62's
        fs32 A/B) where the small-batch convs don't gain from bf16 and the
        converts cost.  Frame-count gate is trace-time static."""
        name = self.first_stage_dtype
        if name == "auto":
            if jax.default_backend() == "tpu" and (
                n_frames is None or n_frames >= 32
            ):
                return jnp.bfloat16
            return jnp.float32
        return jnp.dtype(name)

    # ------------------------------------------------------------------ #
    # first/cond stage
    # ------------------------------------------------------------------ #
    def _frames(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
        """(B, T, H, W, C) -> (B*T, H, W, C)."""
        B = x.shape[0]
        return x.reshape((-1,) + x.shape[2:]), B

    def _unframes(self, x: jnp.ndarray, batch: int) -> jnp.ndarray:
        return x.reshape((batch, -1) + x.shape[1:])

    def encode_first_stage(
        self, vae_params, x: jnp.ndarray, rng: Optional[jax.Array] = None,
        sample_posterior: bool = False,
    ) -> jnp.ndarray:
        """Pixel seq (B,T,H,W,C) -> scaled latent seq (B,T,h,w,c).
        Training samples the posterior; conditioning takes the mode
        (ref :382-391 / :361-380)."""
        frames, B = self._frames(x)
        moments = self.first_stage_moments(vae_params, frames)
        posterior = DiagonalGaussianDistribution.from_parameters(moments)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self._unframes(self.scale_factor * z, B)

    def first_stage_moments(self, vae_params, frames: jnp.ndarray) -> jnp.ndarray:
        """(n, H, W, C) frames -> (n, h, w, 2c) f32 encoder moments, under the
        ``first_stage_dtype`` policy.  This is the unit cached by
        ``scripts/precompute_latents.py``."""
        dtype = self._resolved_first_stage_dtype(n_frames=frames.shape[0])
        if dtype != jnp.float32:
            frames = frames.astype(dtype)
            vae_params = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a,
                vae_params,
            )
        moments = self.vae_apply_encode({"params": vae_params}, frames)
        return moments.astype(jnp.float32)

    def latents_from_moments(
        self, moments: jnp.ndarray, rng: Optional[jax.Array] = None,
        sample_posterior: bool = False,
    ) -> jnp.ndarray:
        """Cached encoder moments (B,T,h,w,2c) -> scaled latent seq
        (B,T,h,w,c).  Mirrors the tail of :meth:`encode_first_stage` exactly
        (frame-flattened posterior sample / mode, then ``scale_factor``) so a
        training step fed from a latent cache reproduces the pixel-input step
        bit-for-bit given the same rng — provided the cache was written with
        the same encoder compute dtype the pixel step would use (recorded in
        the cache meta as ``encode_dtype``; on TPU ``first_stage_dtype
        ='auto'`` is frame-count-gated)."""
        from ..utils.distributions import latents_from_moments_seq

        return latents_from_moments_seq(
            moments, rng=rng, sample_posterior=sample_posterior,
            scale_factor=self.scale_factor,
        )

    def training_loss_from_moments(
        self, unet_params, logvar, rng: jax.Array,
        mx: jnp.ndarray, my: jnp.ndarray, train: bool = True,
        prefix: str = "train",
    ):
        """:meth:`training_loss` fed from cached first-stage moments instead
        of pixels — the frozen VAE encoder (~14% of the pixel-input train
        step's device time at B=8, probe56) drops out of the step entirely.
        ``mx``/``my`` are the encoder moments of the target/context windows
        (see ``scripts/precompute_latents.py``).  The rng split matches
        :meth:`training_loss` so, given ``mx = encode_moments(x)`` and
        ``my = encode_moments(y)``, both paths produce identical losses."""
        rng_enc, rng_t, rng_noise, rng_drop = jax.random.split(rng, 4)
        z = self.latents_from_moments(mx, rng=rng_enc, sample_posterior=True)
        zc = self.latents_from_moments(my, sample_posterior=False)
        B = mx.shape[0]
        t = jax.random.randint(rng_t, (B,), 0, self.num_timesteps)
        noise = jax.random.normal(rng_noise, z.shape, z.dtype)
        return self.p_losses(
            unet_params, logvar, z, zc, t, noise,
            dropout_rng=rng_drop, train=train, prefix=prefix,
        )

    def decode_first_stage(self, vae_params, z: jnp.ndarray) -> jnp.ndarray:
        """Latent seq (B,T,h,w,c) -> pixel seq (B,T,H,W,C).

        When ``decode_chunk_size`` is set, frames are decoded
        ``decode_chunk_size`` at a time under ``lax.map`` — the TPU-native
        equivalent of the reference's ``use_slicing`` sliced decode
        (taming/autoencoder_kl.py:91-113): peak decoder activation memory is
        bounded by the chunk, while staying inside one compiled graph."""
        frames, B = self._frames(z / self.scale_factor)
        chunk = self.decode_chunk_size
        n_frames = frames.shape[0]
        if chunk and n_frames > chunk:
            n_pad = -n_frames % chunk
            padded = jnp.concatenate(
                [frames, jnp.zeros((n_pad,) + frames.shape[1:], frames.dtype)]
            ) if n_pad else frames
            chunks = padded.reshape((-1, chunk) + frames.shape[1:])
            dec = jax.lax.map(
                lambda f: self.vae_apply_decode({"params": vae_params}, f),
                chunks,
            )
            dec = dec.reshape((-1,) + dec.shape[2:])[:n_frames]
        else:
            dec = self.vae_apply_decode({"params": vae_params}, frames)
        return self._unframes(dec, B)

    def cond_stage_forward(self, vae_params, y: jnp.ndarray) -> jnp.ndarray:
        return self.encode_first_stage(vae_params, y, sample_posterior=False)

    def sample_ensemble(
        self,
        unet_params,
        vae_params,
        rng: jax.Array,
        y: jnp.ndarray,
        num_samples: int,
        **kwargs,
    ) -> jnp.ndarray:
        """Draw ``num_samples`` forecasts per context by folding the ensemble
        into the batch axis (shards across the data mesh like any batch;
        SURVEY.md §2.5: ensembles map onto the mesh's batch axis).

        Returns (num_samples, B, T_out, H, W, C)."""
        B = y.shape[0]
        y_rep = jnp.repeat(y, num_samples, axis=0)  # (B*M, ...)
        align_kwargs = kwargs.pop("alignment_kwargs", None)
        if align_kwargs is not None and "avg_x_gt" in align_kwargs:
            align_kwargs = dict(align_kwargs)
            align_kwargs["avg_x_gt"] = jnp.repeat(
                align_kwargs["avg_x_gt"], num_samples, axis=0
            )
        out = self.sample(unet_params, vae_params, rng, y_rep,
                          alignment_kwargs=align_kwargs, **kwargs)
        return out.reshape((B, num_samples) + out.shape[1:]).swapaxes(0, 1)

    def calibrate_scale_by_std(self, vae_params, x: jnp.ndarray,
                               rng: Optional[jax.Array] = None) -> float:
        """Set scale_factor to 1/std of the first batch's encodings
        (ref scale_by_std, latent_diffusion.py:301-317).  Call once before
        training; returns the new factor."""
        prev = self.scale_factor
        self.scale_factor = 1.0
        z = self.encode_first_stage(vae_params, x, rng=rng,
                                    sample_posterior=rng is not None)
        std = float(jnp.std(z.ravel()))
        self.scale_factor = 1.0 / std
        self._jit_cache.clear()
        return self.scale_factor

    # ------------------------------------------------------------------ #
    # training loss
    # ------------------------------------------------------------------ #
    def init_logvar(self) -> jnp.ndarray:
        return jnp.full((self.num_timesteps,), self.logvar_init, jnp.float32)

    def p_losses(
        self,
        unet_params,
        logvar: jnp.ndarray,
        z_start: jnp.ndarray,
        zc: jnp.ndarray,
        t: jnp.ndarray,
        noise: jnp.ndarray,
        dropout_rng: Optional[jax.Array] = None,
        train: bool = False,
        prefix: str = "train",
    ):
        z_noisy = core.q_sample(self.schedule, z_start, t, noise)
        kwargs = {}
        if train and dropout_rng is not None:
            kwargs = dict(rngs={"dropout": dropout_rng}, deterministic=False)
        model_out = self.unet_apply({"params": unet_params}, z_noisy, t, zc, **kwargs)
        return core.diffusion_loss(
            self.schedule, model_out, z_start, noise, t, logvar,
            parameterization=self.parameterization,
            loss_type=self.loss_type,
            l_simple_weight=self.l_simple_weight,
            original_elbo_weight=self.original_elbo_weight,
            learn_logvar=self.learn_logvar,
            prefix=prefix,
        )

    def training_loss(
        self, unet_params, logvar, vae_params, rng: jax.Array,
        x: jnp.ndarray, y: jnp.ndarray, train: bool = True, prefix: str = "train",
    ):
        """Full forward (ref :447-476): encode target (posterior sample) and
        context (mode), draw t, add noise, denoise, weigh."""
        rng_enc, rng_t, rng_noise, rng_drop = jax.random.split(rng, 4)
        z = self.encode_first_stage(vae_params, x, rng=rng_enc, sample_posterior=True)
        z = jax.lax.stop_gradient(z)
        zc = jax.lax.stop_gradient(self.cond_stage_forward(vae_params, y))
        B = x.shape[0]
        t = jax.random.randint(rng_t, (B,), 0, self.num_timesteps)
        noise = jax.random.normal(rng_noise, z.shape, z.dtype)
        return self.p_losses(
            unet_params, logvar, z, zc, t, noise,
            dropout_rng=rng_drop, train=train, prefix=prefix,
        )

    # ------------------------------------------------------------------ #
    # sampling
    # ------------------------------------------------------------------ #
    def _p_sample_step(
        self, unet_params, align_params, z, t, zc, y, avg_x_gt, step_rng,
        use_alignment: bool, temperature: float = 1.0,
        noise_fn=None, axis_name=None, guidance_every_k: int = 1,
    ):
        """One reverse step (ref p_sample :598-631).  ``noise_fn`` abstracts
        noise generation so the shard_map path can draw each device's slice
        of the GLOBAL noise tensor (bit-identical to unsharded sampling);
        ``axis_name`` threads the mesh axis into the guidance psum.

        ``guidance_every_k`` (round-4, VERDICT r3 #6, opt-in): apply the
        alignment mean shift only on steps with t % k == 0 (the final t=0
        step is always guided), scaled by k to keep the cumulative shift
        mass — the alignment net's fwd+bwd is the whole guided-sampling
        overhead (probe47b: compute-bound at tiny shapes), so skipping it
        on the other steps buys ~(1 - 1/k) of that cost.  Semantics change:
        k=1 is the reference behavior (latent_diffusion.py:592-596)."""
        if noise_fn is None:
            noise_fn = lambda rng, shape, dtype: jax.random.normal(rng, shape, dtype)  # noqa: E731
        model_out = self.unet_apply({"params": unet_params}, z, t, zc)
        mean, _, log_var, _ = core.p_mean_variance(
            self.schedule, model_out, z, t,
            parameterization=self.parameterization,
            clip_denoised=self.clip_denoised,
        )
        if use_alignment:
            align = self.alignment.replace(params=align_params)
            k = int(guidance_every_k)
            if k <= 1:
                shift = align.get_mean_shift(z, t, avg_x_gt, zc=zc, y=y,
                                             axis_name=axis_name)
                mean = mean - jnp.exp(0.5 * log_var) * shift
            else:
                def guided(ops):
                    z_, mean_, log_var_ = ops
                    shift = align.get_mean_shift(z_, t, avg_x_gt, zc=zc, y=y,
                                                 axis_name=axis_name)
                    return mean_ - jnp.exp(0.5 * log_var_) * (float(k) * shift)

                mean = jax.lax.cond(
                    (t[0] % k) == 0, guided, lambda ops: ops[1],
                    (z, mean, log_var),
                )
        noise = noise_fn(step_rng, z.shape, z.dtype) * temperature
        nonzero = (t > 0).astype(z.dtype).reshape((-1,) + (1,) * (z.ndim - 1))
        return mean + nonzero * jnp.exp(0.5 * log_var) * noise

    def _build_sample_fn(
        self,
        batch_size: int,
        use_alignment: bool,
        timesteps: Optional[int],
        return_decoded: bool,
        use_mask: bool,
        num_segments: int,
        temperature: float,
        scan_unroll: int,
        compute_dtype_name: str,
        sampler: str,
        ddim_steps: Optional[int],
        ddim_eta: float,
        ddim_clip_x0: bool,
        guidance_every_k: int = 1,
        mesh=None,
        mesh_axis: str = "data",
    ):
        """Compile the full sampling chain for a static configuration.

        With ``mesh`` (round-3): the WHOLE chain runs under ``jax.shard_map``
        over the mesh's batch axis, so every pallas_call launches a per-device
        grid over only its batch shard — GSPMD would otherwise replicate the
        kernels on every chip (SURVEY §2.5: DDP shards all compute).  Noise is
        drawn as each device's slice of the global noise tensor and the
        guidance energy psums across the mesh, so sharded sampling is
        BIT-IDENTICAL to the unsharded path."""
        total_T = timesteps or self.num_timesteps
        n_shards = 1 if mesh is None else int(np.prod(mesh.devices.shape))
        assert batch_size % n_shards == 0, (batch_size, n_shards)
        local_bs = batch_size // n_shards  # per-device batch under shard_map
        latent_shape = (local_bs,) + self.latent_shape
        compute_dtype = jnp.dtype(compute_dtype_name)
        axis_name = mesh_axis if mesh is not None else None

        if mesh is None:
            def noise_fn(rng, shape, dtype):
                return jax.random.normal(rng, shape, dtype)
        else:
            def noise_fn(rng, shape, dtype):
                # this device's slice of the GLOBAL noise tensor
                full = jax.random.normal(rng, (batch_size,) + tuple(shape[1:]),
                                         dtype)
                idx = jax.lax.axis_index(mesh_axis)
                return jax.lax.dynamic_slice_in_dim(
                    full, idx * shape[0], shape[0], 0
                )

        if sampler == "ddpm":
            ts_all = np.arange(total_T - 1, -1, -1, dtype=np.int32)
        elif sampler == "ddim":
            assert ddim_steps is not None
            ddim_ts = make_ddim_timesteps("uniform", ddim_steps, total_T)
            ddim_ts = np.clip(ddim_ts, 0, total_T - 1)
            sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(
                np.asarray(self.schedule.alphas_cumprod, dtype=np.float64),
                ddim_ts, ddim_eta,
            )
            ts_all = np.arange(len(ddim_ts) - 1, -1, -1, dtype=np.int32)  # indices
            ddim_ts = jnp.asarray(ddim_ts.astype(np.int32))
            ddim_sigmas = jnp.asarray(sigmas.astype(np.float32))
            ddim_alphas = jnp.asarray(alphas.astype(np.float32))
            ddim_alphas_prev = jnp.asarray(alphas_prev.astype(np.float32))
        else:
            raise NotImplementedError(f"sampler '{sampler}'")

        segments = np.array_split(ts_all, num_segments)

        def ddpm_step(unet_params, align_params, zc, y, avg_x_gt, mask, x0, rng, z, t_scalar):
            step_rng = jax.random.fold_in(rng, t_scalar)
            t_b = jnp.full((local_bs,), t_scalar, jnp.int32)
            z = self._p_sample_step(
                unet_params, align_params, z, t_b, zc, y, avg_x_gt, step_rng,
                use_alignment=use_alignment, temperature=temperature,
                noise_fn=noise_fn, axis_name=axis_name,
                guidance_every_k=guidance_every_k,
            )
            if use_mask:
                noise = noise_fn(jax.random.fold_in(step_rng, 1), z.shape, z.dtype)
                z_orig = core.q_sample(self.schedule, x0, t_b, noise)
                z = z_orig * mask + (1.0 - mask) * z
            return z.astype(compute_dtype)

        def ddim_step(unet_params, align_params, zc, y, avg_x_gt, mask, x0, rng, z, idx):
            t_scalar = ddim_ts[idx]
            step_rng = jax.random.fold_in(rng, idx)
            t_b = jnp.full((local_bs,), t_scalar, jnp.int32)
            model_out = self.unet_apply({"params": unet_params}, z, t_b, zc)
            if self.parameterization == "eps":
                eps = model_out
                a_t = ddim_alphas[idx]
                x0_pred = (z - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            else:
                x0_pred = model_out
                a_t = ddim_alphas[idx]
                eps = (z - jnp.sqrt(a_t) * x0_pred) / jnp.sqrt(1.0 - a_t)
            if ddim_clip_x0 or self.clip_denoised:
                x0_pred = jnp.clip(x0_pred, -1.0, 1.0)
            a_prev = ddim_alphas_prev[idx]
            sigma = ddim_sigmas[idx]
            if use_alignment:
                # shift eps by sigma_t * grad (classifier-guidance equivalent)
                align = self.alignment.replace(params=align_params)
                kk = int(guidance_every_k)

                def _guided_eps(ops):
                    z_, eps_ = ops
                    shift = align.get_mean_shift(z_, t_b, avg_x_gt, zc=zc,
                                                 y=y, axis_name=axis_name)
                    return eps_ + jnp.sqrt(1.0 - a_t) * (float(max(kk, 1)) * shift)

                if kk <= 1:
                    eps = _guided_eps((z, eps))
                else:  # every k-th DDIM step (idx 0 = the final step: guided)
                    eps = jax.lax.cond((idx % kk) == 0, _guided_eps,
                                       lambda ops: ops[1], (z, eps))
                x0_pred = (z - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
            dir_zt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma**2, 0.0)) * eps
            noise = noise_fn(step_rng, z.shape, z.dtype) * temperature
            return (jnp.sqrt(a_prev) * x0_pred + dir_zt + sigma * noise).astype(compute_dtype)

        step = ddpm_step if sampler == "ddpm" else ddim_step

        # Everything — x_T generation, cond encode, the reverse scan, decode —
        # lives inside ONE jit so a sample() call is a single device dispatch
        # (eager per-call ops are pathological on remote/tunneled devices).
        def sample_body(unet_params, vae_params, align_params, rng, y,
                        avg_x_gt, x_T, mask, x0):
            if mesh is not None:  # shard_map hands each device its shard
                assert y.shape[0] == local_bs, (y.shape, local_bs)
            rng_init, rng_loop = jax.random.split(rng)
            z = (
                noise_fn(rng_init, latent_shape, jnp.float32)
                if x_T is None else x_T
            ).astype(compute_dtype)
            zc = self.cond_stage_forward(vae_params, y).astype(compute_dtype)
            intermediates = []
            for seg in segments:
                seg_arr = jnp.asarray(seg)

                def body(carry, t_scalar):
                    z = carry
                    z = step(unet_params, align_params, zc, y, avg_x_gt,
                             mask, x0, rng_loop, z, t_scalar)
                    return z, None

                z, _ = jax.lax.scan(body, z, seg_arr, unroll=scan_unroll)
                intermediates.append(z)
            if return_decoded:
                out = self.decode_first_stage(vae_params, z)
                inter = (
                    [self.decode_first_stage(vae_params, i) for i in intermediates]
                    if num_segments > 1 else None
                )
            else:
                out = z
                inter = intermediates if num_segments > 1 else None
            return out, inter

        if mesh is None:
            return jax.jit(sample_body)

        from jax.sharding import PartitionSpec as P

        data = P(mesh_axis)
        repl = P()
        mapped = jax.shard_map(
            sample_body,
            mesh=mesh,
            # params/rng replicated; batch-carrying args sharded on the mesh
            # axis (None args are leafless pytrees — any spec prefix matches)
            in_specs=(repl, repl, repl, repl, data, data, data, data, data),
            out_specs=(data, data),
            check_vma=False,  # guidance psum + closure constants
        )
        return jax.jit(mapped)

    def sample(
        self,
        unet_params,
        vae_params,
        rng: jax.Array,
        y: jnp.ndarray,
        align_params=None,
        use_alignment: bool = False,
        alignment_kwargs: Optional[Dict[str, jnp.ndarray]] = None,
        x_T: Optional[jnp.ndarray] = None,
        timesteps: Optional[int] = None,
        mask: Optional[jnp.ndarray] = None,
        x0: Optional[jnp.ndarray] = None,
        return_intermediates: bool = False,
        return_decoded: bool = True,
        temperature: float = 1.0,
        sampler: str = "ddpm",
        ddim_steps: Optional[int] = None,
        ddim_eta: float = 0.0,
        ddim_clip_x0: bool = False,
        scan_unroll: int = 1,
        compute_dtype="float32",
        guidance_every_k: int = 1,
        mesh=None,
    ):
        """Generate a forecast from context ``y`` (B, T_in, H, W, C).

        ``mesh``: a 1-D ``jax.sharding.Mesh`` — when it has more than one
        device the whole chain runs shard_map-partitioned over its ``data``
        axis (pallas kernels launch per-shard; outputs are bit-identical to
        unsharded sampling).  Returns decoded pixels (B, T_out, H, W, C) (or
        latents), plus intermediates when requested."""
        if use_alignment:
            assert self.alignment is not None, "alignment not configured"
        if mesh is not None and (
            int(np.prod(mesh.devices.shape)) == 1
            or y.shape[0] % int(np.prod(mesh.devices.shape)) != 0
        ):
            mesh = None  # single device / indivisible batch: plain jit
        batch_size = y.shape[0]
        num_segments = (
            max(1, (timesteps or self.num_timesteps) // self.log_every_t)
            if return_intermediates else 1
        )
        key = (
            batch_size, use_alignment, timesteps, return_decoded,
            mask is not None, num_segments, float(temperature),
            int(scan_unroll), jnp.dtype(compute_dtype).name,
            sampler, ddim_steps, float(ddim_eta), ddim_clip_x0,
            int(guidance_every_k),
        )
        if (key, mesh) not in self._jit_cache:
            self._jit_cache[(key, mesh)] = self._build_sample_fn(*key, mesh=mesh)
        fn = self._jit_cache[(key, mesh)]

        out, inter = fn(
            unet_params, vae_params,
            align_params if align_params is not None else (
                self.alignment.params if self.alignment else 0
            ),
            rng, y,
            (alignment_kwargs or {}).get("avg_x_gt"),
            x_T, mask, x0,
        )
        if return_intermediates:
            return out, inter
        return out
