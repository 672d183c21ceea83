"""Two-optimizer VAE-GAN training — the TPU equivalent of the reference's
manual-optimization Lightning module (scripts/vae/sevirlr/train_vae_sevirlr.py:433-475
+ taming/losses/contperceptual.py).

One jitted step runs: generator update (L1 recon + logvar NLL + KL + adaptive
adversarial) then discriminator update (hinge on real/fake), both in-graph.
The adaptive d_weight uses two jax.grad calls wrt the decoder's final conv
kernel on a fixed pre-conv-out feature map (exact reference semantics without
autograd re-entry)."""
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.vae import AutoencoderKL
from ..utils.distributions import DiagonalGaussianDistribution
from ..utils.precision import cast_pytree
from ..parallel.mesh import batch_sharding, replicated_sharding
from .losses import (
    NLayerDiscriminator,
    generator_loss,
    discriminator_loss,
    calculate_adaptive_weight,
)
from .train_state import EmaTrainState
from .optim import build_optimizer


def _conv2d_same(h: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """3x3 'same' NHWC conv used to re-apply the decoder's conv_out with a
    substituted kernel."""
    pad = (kernel.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        h, kernel, window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


class VAETrainer:
    def __init__(
        self,
        vae: AutoencoderKL,
        disc: Optional[NLayerDiscriminator] = None,
        disc_start: int = 50001,
        kl_weight: float = 1e-6,
        disc_weight: float = 0.5,
        disc_factor: float = 1.0,
        disc_loss: str = "hinge",
        logvar_init: float = 0.0,
        perceptual_fn: Optional[Callable] = None,
        perceptual_weight: float = 0.0,
        optim_config: Optional[Dict] = None,
        disc_optim_config: Optional[Dict] = None,
        mesh: Optional[Mesh] = None,
        flat_update: bool = False,
        pack_small_thr: int = 0,
        compute_dtype: Optional[str] = None,
    ):
        self.vae = vae
        self.disc = disc or NLayerDiscriminator(input_nc=vae.out_channels, n_layers=3)
        self.disc_start = disc_start
        self.kl_weight = kl_weight
        self.disc_weight = disc_weight
        self.disc_factor = disc_factor
        self.disc_loss = disc_loss
        self.logvar_init = logvar_init
        self.perceptual_fn = perceptual_fn
        self.perceptual_weight = perceptual_weight
        self.optim_config = dict(optim_config or {})
        self.disc_optim_config = dict(disc_optim_config or self.optim_config)
        self.mesh = mesh
        # raveled-vector optimizer updates (see EmaTrainState.flat_update)
        self.flat_update = flat_update
        # small-leaf-packed updates (see EmaTrainState.pack_small_thr)
        self.pack_small_thr = pack_small_thr
        # 'bfloat16' runs the VAE fwd/bwd with bf16 params+activations
        # (halves HBM activation/remat traffic — the B=32 step is
        # conv-bandwidth-heavy).  Params are STORED f32; loss math, KL,
        # logvar, adaptive-weight grads, the discriminator, and the
        # optimizer all stay f32.  'auto' = bf16 iff the default backend
        # is a real TPU (CPU tests keep the reference-parity f32 path).
        # None/'float32' = off.
        self.compute_dtype = compute_dtype
        self._train_step = None

    def _resolved_compute_dtype(self):
        cd = self.compute_dtype
        if cd == "auto":
            cd = "bfloat16" if jax.default_backend() == "tpu" else None
        if cd in (None, "float32", "f32"):
            return None
        return jnp.dtype(cd)

    def create_states(self, rng, sample_input) -> Tuple[EmaTrainState, EmaTrainState, Any]:
        """Returns (gen_state, disc_state, disc_batch_stats)."""
        rng_v, rng_d = jax.random.split(rng)
        vae_params = self.vae.init(rng_v, sample_input)["params"]
        disc_vars = self.disc.init(rng_d, sample_input, train=False)
        gen_params = {
            "vae": vae_params,
            "logvar": jnp.asarray(self.logvar_init, jnp.float32),
        }
        gen_state = EmaTrainState.create(
            gen_params, build_optimizer(**self.optim_config), use_ema=False,
            flat_update=self.flat_update, pack_small_thr=self.pack_small_thr,
        )
        disc_state = EmaTrainState.create(
            disc_vars["params"], build_optimizer(**self.disc_optim_config),
            use_ema=False, flat_update=self.flat_update,
            pack_small_thr=self.pack_small_thr,
        )
        batch_stats = disc_vars.get("batch_stats", {})
        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            gen_state = jax.device_put(gen_state, repl)
            disc_state = jax.device_put(disc_state, repl)
            batch_stats = jax.device_put(batch_stats, repl)
        return gen_state, disc_state, batch_stats

    # -------------------------------------------------------------- #
    def _reconstruct(self, vae_params, x, rng):
        cd = self._resolved_compute_dtype()
        if cd is not None:
            # bf16 params/activations through the conv stacks; the cast of
            # the f32 leaves is differentiated (its VJP casts cotangents
            # back), so grads land on the stored f32 tree.  Moments, the
            # posterior sample, and the returned recon/feats are upcast so
            # every loss reduction stays f32.
            vae_params = cast_pytree(vae_params, cd)
            x = x.astype(cd)
        moments = self.vae.apply(
            {"params": vae_params}, x, method=AutoencoderKL.encode_moments
        ).astype(jnp.float32)
        posterior = DiagonalGaussianDistribution.from_parameters(moments)
        z = posterior.sample(rng)
        if cd is not None:
            z = z.astype(cd)
        recon, feats = self.vae.apply(
            {"params": vae_params}, z, method=AutoencoderKL.decode_with_features
        )
        return (recon.astype(jnp.float32), feats.astype(jnp.float32),
                posterior)

    def _disc_apply(self, disc_params, batch_stats, x, train: bool):
        variables = {"params": disc_params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        if train and batch_stats:
            logits, updates = self.disc.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return logits, updates["batch_stats"]
        logits = self.disc.apply(variables, x, train=False)
        return logits, batch_stats

    def make_train_step(self):
        def step(gen_state: EmaTrainState, disc_state: EmaTrainState,
                 batch_stats, rng, x):
            step_rng = jax.random.fold_in(rng, gen_state.step)
            global_step = gen_state.step

            # ---------------- generator update ---------------- #
            def gen_loss_fn(gen_params):
                vae_params = gen_params["vae"]
                logvar = gen_params["logvar"]
                recon, feats, posterior = self._reconstruct(vae_params, x, step_rng)
                logits_fake, _ = self._disc_apply(
                    disc_state.params, batch_stats, recon, train=True
                )
                kernel = vae_params["decoder"]["conv_out"]["kernel"]
                bias = vae_params["decoder"]["conv_out"]["bias"]
                h_sg = jax.lax.stop_gradient(feats)
                batch = x.shape[0]

                def nll_of_kernel(kk):
                    rec = jnp.abs(x - _conv2d_same(h_sg, kk, bias))
                    if self.perceptual_fn is not None and self.perceptual_weight > 0:
                        rec = rec + self.perceptual_weight * self.perceptual_fn(
                            x, _conv2d_same(h_sg, kk, bias)
                        )
                    nll = rec / jnp.exp(logvar) + logvar
                    return jnp.sum(nll) / batch

                def g_of_kernel(kk):
                    logits, _ = self._disc_apply(
                        jax.lax.stop_gradient(disc_state.params), batch_stats,
                        _conv2d_same(h_sg, kk, bias), train=True,
                    )
                    return -jnp.mean(logits)

                d_weight = calculate_adaptive_weight(
                    nll_of_kernel, g_of_kernel, kernel, self.disc_weight
                )
                perceptual = None
                if self.perceptual_fn is not None and self.perceptual_weight > 0:
                    perceptual = self.perceptual_fn(x, recon)
                loss, log = generator_loss(
                    x, recon, posterior.kl(), logvar, logits_fake, d_weight,
                    global_step, self.disc_start, kl_weight=self.kl_weight,
                    disc_factor=self.disc_factor, perceptual=perceptual,
                    perceptual_weight=self.perceptual_weight,
                )
                return loss, (log, recon)

            (g_total, (g_log, recon)), g_grads = jax.value_and_grad(
                gen_loss_fn, has_aux=True
            )(gen_state.params)
            new_gen_state = gen_state.apply_gradients(g_grads)

            # ---------------- discriminator update ---------------- #
            recon_sg = jax.lax.stop_gradient(recon)

            def disc_loss_fn(disc_params):
                logits_real, bs1 = self._disc_apply(disc_params, batch_stats, x, train=True)
                logits_fake, bs2 = self._disc_apply(disc_params, bs1, recon_sg, train=True)
                d_loss, d_log = discriminator_loss(
                    logits_real, logits_fake, global_step, self.disc_start,
                    disc_factor=self.disc_factor, disc_loss=self.disc_loss,
                )
                return d_loss, (d_log, bs2)

            (d_total, (d_log, new_batch_stats)), d_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(disc_state.params)
            new_disc_state = disc_state.apply_gradients(d_grads)

            logs = {**g_log, **d_log}
            return new_gen_state, new_disc_state, new_batch_stats, logs

        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            data = batch_sharding(self.mesh)
            return jax.jit(
                step,
                in_shardings=(repl, repl, repl, repl, data),
                out_shardings=(repl, repl, repl, repl),
                donate_argnums=(0, 1, 2),
            )
        return jax.jit(step, donate_argnums=(0, 1, 2))

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step
