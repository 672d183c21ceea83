"""Knowledge-alignment network training — the TPU equivalent of AlignmentPL
(src/prediff/diffusion/knowledge_alignment/alignment_pl.py:22, forward :338).

U(z_t, t, y, zc) is regressed onto target_fn(x) (per-frame mean intensity for
SEVIR, sevir.py:41) from q_sampled noisy latents."""
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..diffusion import core
from ..diffusion.schedule import GaussianSchedule, make_gaussian_schedule
from ..diffusion.knowledge_alignment import avg_x_objective
from ..models.layers import conv3d_impl
from ..parallel.mesh import batch_sharding, replicated_sharding
from ..utils.distributions import DiagonalGaussianDistribution
from .train_state import EmaTrainState
from .optim import build_optimizer


class AlignmentTrainer:
    def __init__(
        self,
        model_apply: Callable,
        vae_apply_encode: Callable,
        vae_params,
        schedule: Optional[GaussianSchedule] = None,
        timesteps: int = 1000,
        scale_factor: float = 1.0,
        target_fn: Callable = avg_x_objective,
        loss_type: str = "l2",
        optim_config: Optional[Dict] = None,
        use_ema: bool = False,
        mesh: Optional[Mesh] = None,
        prng_impl=None,
        flat_update: bool = False,
        pack_small_thr: int = 0,
        matmul_precision: Optional[str] = None,
        conv3d_impl: Optional[str] = None,
        latent_inputs: bool = False,
    ):
        self.model_apply = model_apply
        self.vae_apply_encode = vae_apply_encode
        self.vae_params = vae_params
        self.schedule = schedule or make_gaussian_schedule(timesteps=timesteps)
        self.scale_factor = scale_factor
        self.target_fn = target_fn
        self.loss_type = loss_type
        self.optim_config = dict(optim_config or {})
        self.use_ema = use_ema
        self.mesh = mesh
        self.prng_impl = prng_impl
        # see DiffusionTrainer: raveled-vector optimizer update + one-pass
        # bf16 MXU operands on real TPUs
        self.flat_update = flat_update
        self.pack_small_thr = pack_small_thr
        self.matmul_precision = matmul_precision
        # see DiffusionTrainer: train-batch shapes prefer XLA's native 3-D
        # conv lowering (probe46/48); 'auto' = native on real TPUs
        self.conv3d_impl = conv3d_impl
        # True: the train step takes cached first-stage moments (mx, my) and
        # the cached per-frame pixel means as the regression target — the
        # frozen VAE encode drops out of the step (datasets/latents.py)
        self.latent_inputs = latent_inputs
        self._train_step = None

    def create_state(self, params) -> EmaTrainState:
        tx = build_optimizer(**self.optim_config)
        state = EmaTrainState.create(params, tx, use_ema=self.use_ema,
                                     flat_update=self.flat_update,
                                     pack_small_thr=self.pack_small_thr)
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        return state

    def _encode(self, x, rng, sample: bool):
        B = x.shape[0]
        frames = x.reshape((-1,) + x.shape[2:])
        moments = self.vae_apply_encode({"params": self.vae_params}, frames)
        posterior = DiagonalGaussianDistribution.from_parameters(moments)
        z = posterior.sample(rng) if sample else posterior.mode()
        z = self.scale_factor * z
        return z.reshape((B, -1) + z.shape[1:])

    def _latents(self, moments, rng, sample: bool):
        """Cached encoder moments (B,T,h,w,2c) -> scaled latents; the latent
        twin of :meth:`_encode` (shared implementation, see
        utils/distributions.py)."""
        from ..utils.distributions import latents_from_moments_seq

        return latents_from_moments_seq(
            moments, rng=rng, sample_posterior=sample,
            scale_factor=self.scale_factor,
        )

    def loss_fn(self, params, rng, x, y, train: bool = True, target=None):
        """x: target pixel seq (B,T_out,H,W,C); y: context seq (B,T_in,H,W,C).
        With ``latent_inputs``, x/y are cached moments windows and ``target``
        is the cached per-frame pixel mean (B,T_out,1)."""
        impl = self.conv3d_impl
        if impl == "auto":
            # per-device batch >= 8: see DiffusionTrainer (probe49 crossover)
            n_shards = (1 if self.mesh is None
                        else int(np.prod(self.mesh.devices.shape)))
            big = x.shape[0] // n_shards >= 8
            impl = ("xla" if jax.default_backend() == "tpu" and big else None)
        with conv3d_impl(impl):
            return self._loss_fn(params, rng, x, y, train, target=target)

    def _loss_fn(self, params, rng, x, y, train: bool = True, target=None):
        rng_enc, rng_t, rng_noise, rng_drop = jax.random.split(rng, 4)
        if self.latent_inputs:
            assert target is not None, "latent mode needs the cached target"
            z = jax.lax.stop_gradient(self._latents(x, rng_enc, sample=True))
            zc = jax.lax.stop_gradient(self._latents(y, None, sample=False))
            y_model = None  # the architecture ignores y (models.py:459)
        else:
            z = jax.lax.stop_gradient(self._encode(x, rng_enc, sample=True))
            zc = jax.lax.stop_gradient(self._encode(y, None, sample=False))
            target = self.target_fn(x)
            y_model = y
        B = x.shape[0]
        t = jax.random.randint(rng_t, (B,), 0, self.schedule.num_timesteps)
        noise = jax.random.normal(rng_noise, z.shape, z.dtype)
        zt = core.q_sample(self.schedule, z, t, noise)
        kwargs = {}
        if train:
            kwargs = dict(rngs={"dropout": rng_drop}, deterministic=False)
        pred = self.model_apply({"params": params}, zt, t, zc=zc, y=y_model,
                                **kwargs)
        if self.loss_type in ("l2", "mse"):
            loss = jnp.mean(jnp.square(pred - target))
        elif self.loss_type in ("l1", "mae"):
            loss = jnp.mean(jnp.abs(pred - target))
        else:
            raise NotImplementedError(self.loss_type)
        mae = jnp.mean(jnp.abs(pred - target))
        avg_gt = jnp.mean(jnp.abs(target))
        loss_dict = {
            "mae": mae,
            "avg_gt": avg_gt,
            "relative_mae": mae / (avg_gt + 1e-8),
        }
        return loss, loss_dict

    def make_train_step(self):
        from .optim import convert_key_impl, resolve_prng_impl

        impl = resolve_prng_impl(self.prng_impl)

        precision = self.matmul_precision
        if precision == "auto":
            precision = "bfloat16" if jax.default_backend() == "tpu" else None

        def step(state: EmaTrainState, rng, x, y, target=None):
            step_rng = convert_key_impl(
                jax.random.fold_in(rng, state.step), impl
            )

            def loss_closure(p):
                if precision is not None:
                    with jax.default_matmul_precision(precision):
                        return self.loss_fn(p, step_rng, x, y, train=True,
                                            target=target)
                return self.loss_fn(p, step_rng, x, y, train=True,
                                    target=target)

            (loss, loss_dict), grads = jax.value_and_grad(
                loss_closure, has_aux=True
            )(state.params)
            new_state = state.apply_gradients(grads)
            loss_dict["train_loss"] = loss
            return new_state, loss_dict

        n_data = 3 if self.latent_inputs else 2
        if not self.latent_inputs:
            step_fn = lambda state, rng, x, y: step(state, rng, x, y)  # noqa: E731
        else:
            step_fn = step
        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            data = batch_sharding(self.mesh)
            return jax.jit(
                step_fn,
                in_shardings=(repl, repl) + (data,) * n_data,
                out_shardings=(repl, repl), donate_argnums=(0,),
            )
        return jax.jit(step_fn, donate_argnums=(0,))

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step
