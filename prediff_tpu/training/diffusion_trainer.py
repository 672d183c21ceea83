"""PreDiff (latent diffusion) training — the TPU equivalent of the reference's
PreDiffSEVIRPLModule training path (train_sevirlr_prediff.py:70,761).

One jitted, sharded train step: encode -> q_sample -> UNet -> weighted loss
-> AdamW (+warmup/cosine) -> EMA, with the batch sharded on the ``data`` mesh
axis and params replicated (XLA inserts the gradient all-reduce)."""
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..diffusion.latent_diffusion import LatentDiffusion
from ..models.layers import conv3d_impl
from ..parallel.mesh import batch_sharding, replicated_sharding
from .train_state import EmaTrainState
from .optim import build_optimizer


class DiffusionTrainer:
    """Owns the jitted train/val steps for the latent diffusion model.

    Trainable params: {"unet": ..., ["logvar": ...]} (logvar is trainable when
    learn_logvar, ref latent_diffusion.py:146-150,726-736); the VAE is frozen.
    """

    def __init__(
        self,
        ld: LatentDiffusion,
        vae_params,
        optim_config: Optional[Dict] = None,
        use_ema: bool = True,
        ema_decay: float = 0.9999,
        mesh: Optional[Mesh] = None,
        remat_unet: bool = False,
        track_grad_norm: bool = False,
        prng_impl=None,
        flat_update: bool = False,
        pack_small_thr: int = 0,
        matmul_precision: Optional[str] = None,
        conv3d_impl: Optional[str] = None,
        latent_inputs: bool = False,
        ema_dtype: Optional[str] = None,
    ):
        self.ld = ld
        self.vae_params = vae_params
        self.optim_config = dict(optim_config or {})
        self.use_ema = use_ema
        self.ema_decay = ema_decay
        self.mesh = mesh
        self.remat_unet = remat_unet
        self.track_grad_norm = track_grad_norm
        # 'auto' -> TPU hardware RNG for the per-step randomness (see
        # training/optim.py::convert_key_impl)
        self.prng_impl = prng_impl
        # single raveled-vector clip/adam/EMA update (see EmaTrainState)
        self.flat_update = flat_update
        # pack small param leaves into one flat optimizer/EMA vector
        # (see EmaTrainState.pack_small_thr); 0 = per-leaf updates
        self.pack_small_thr = pack_small_thr
        # 'bfloat16' (or 'auto' = bf16 on real TPUs) wraps the loss in
        # jax.default_matmul_precision.  Measured a no-op on the v1 config
        # (probe45: identical step time and loss — XLA already runs these
        # convs' MXU passes in bf16), so default None; kept for configs
        # where XLA's own demotion is less aggressive.
        self.matmul_precision = matmul_precision
        # Per-CONTEXT 3-D conv lowering: at the B>=8 train shapes XLA's
        # native 3-D conv beats the t2d decomposition on fwd+dx+dw
        # (probe46/48) while t2d stays the sampler default (B=1 layout
        # pathology, probe15/18-19).  'auto' = native on real TPUs; None
        # keeps the module default.
        self.conv3d_impl = conv3d_impl
        # True: train/val steps take cached first-stage MOMENTS (mx, my)
        # instead of pixel windows (x, y) — the frozen VAE encode drops out
        # of the step (see LatentDiffusion.training_loss_from_moments and
        # scripts/precompute_latents.py)
        self.latent_inputs = latent_inputs
        # 'bfloat16': EMA shadow STORAGE dtype (round-5 opt-in, see
        # EmaTrainState.ema_dtype; pair with optim_config['state_dtype']
        # for bf16 Adam moments).  A/B: scripts/probes/bf16_state_ab.py.
        self.ema_dtype = ema_dtype
        self._train_step = None
        self._val_step = None

    def _resolved_matmul_precision(self) -> Optional[str]:
        if self.matmul_precision == "auto":
            return "bfloat16" if jax.default_backend() == "tpu" else None
        return self.matmul_precision

    def _resolved_conv3d_impl(self, local_batch: int) -> Optional[str]:
        """'auto': native XLA 3-D conv only when the per-device batch is
        large enough to fill its im2col GEMMs (probe49: +3.6% whole-step at
        B=8 but -7.6% at B=2, where t2d's folded-T batching wins)."""
        if self.conv3d_impl == "auto":
            if jax.default_backend() == "tpu" and local_batch >= 8:
                return "xla"
            return None
        return self.conv3d_impl

    def create_state(self, unet_params) -> EmaTrainState:
        params = {"unet": unet_params}
        if self.ld.learn_logvar:
            params["logvar"] = self.ld.init_logvar()
        tx = build_optimizer(**self.optim_config)
        state = EmaTrainState.create(
            params, tx, use_ema=self.use_ema, ema_decay=self.ema_decay,
            flat_update=self.flat_update, pack_small_thr=self.pack_small_thr,
            ema_dtype=self.ema_dtype,
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicated_sharding(self.mesh))
        return state

    def _loss_fn(self, params, rng, x, y, train: bool, prefix: str,
                 latent: Optional[bool] = None):
        # Activation rematerialization (the reference's checkpoint_level) is
        # applied here over the whole loss when requested — XLA schedules a
        # step-level remat better than per-module checkpoints.
        logvar = params.get("logvar", self.ld.init_logvar())
        latent = self.latent_inputs if latent is None else latent
        if latent:
            loss_fn = self.ld.training_loss_from_moments
            if train and self.remat_unet:
                loss_fn = jax.checkpoint(loss_fn, static_argnums=(5, 6))
            args = (params["unet"], logvar, rng, x, y, train, prefix)
        else:
            loss_fn = self.ld.training_loss
            if train and self.remat_unet:
                loss_fn = jax.checkpoint(loss_fn, static_argnums=(6, 7))
            args = (params["unet"], logvar, self.vae_params, rng, x, y,
                    train, prefix)
        # conv3d_impl(...) resolves at trace time, so the train/val programs
        # pick their 3-D conv lowering independently of the sampler's.
        n_shards = (1 if self.mesh is None
                    else int(np.prod(self.mesh.devices.shape)))
        with conv3d_impl(self._resolved_conv3d_impl(x.shape[0] // n_shards)):
            return loss_fn(*args)

    def _train_step_body(self):
        """The un-jitted single-step body shared by :meth:`make_train_step`
        and :meth:`make_train_step_scan` (identical math by construction —
        the scan version's per-step rng is the same ``fold_in(rng,
        state.step)``, and ``state.step`` advances inside the scan)."""
        from jax.flatten_util import ravel_pytree

        from .optim import convert_key_impl, resolve_prng_impl

        impl = resolve_prng_impl(self.prng_impl)
        precision = self._resolved_matmul_precision()

        def step(state: EmaTrainState, rng, x, y):
            step_rng = convert_key_impl(
                jax.random.fold_in(rng, state.step), impl
            )

            def loss_fn(params):
                if precision is not None:
                    with jax.default_matmul_precision(precision):
                        return self._loss_fn(params, step_rng, x, y, True, "train")
                return self._loss_fn(params, step_rng, x, y, True, "train")

            (loss, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads)
            if self.flat_update:
                # one reduce over the same concatenate apply_gradients uses
                # (CSE'd) instead of one tiny reduction per param leaf
                loss_dict["grad_norm"] = jnp.linalg.norm(ravel_pytree(grads)[0])
            elif self.pack_small_thr:
                # same packing apply_gradients uses (CSE'd with clip's norm)
                loss_dict["grad_norm"] = optax_global_norm(
                    state.pack_like(grads))
            else:
                loss_dict["grad_norm"] = optax_global_norm(grads)
            if self.track_grad_norm:
                # per-top-level-module norms (parity: Lightning
                # track_grad_norm=2, ref train_sevirlr_prediff.py:1088-1094)
                for name, sub in grads["unet"].items():
                    loss_dict[f"grad_norm/unet.{name}"] = optax_global_norm(sub)
                if "logvar" in grads:
                    loss_dict["grad_norm/logvar"] = optax_global_norm(grads["logvar"])
            return new_state, loss_dict

        return step

    def make_train_step(self):
        step = self._train_step_body()
        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            data = batch_sharding(self.mesh)
            return jax.jit(
                step,
                in_shardings=(repl, repl, data, data),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(step, donate_argnums=(0,))

    def make_train_step_scan(self):
        """K steps per dispatch: ``(state, rng, xs, ys)`` with ``xs``/``ys``
        stacked ``(K, B, ...)`` batches; returns the final state and metrics
        stacked ``(K,)`` per key.  ``lax.scan`` over the SAME single-step
        body as :meth:`make_train_step`, so K scanned steps match K
        sequential calls (per-step rng is ``fold_in(rng, state.step)`` in
        both; tested to LSB tolerance — the two compiled programs may
        fuse/reassociate differently).  Amortizes per-dispatch host
        overhead — on the axon relay the fixed cost is 24-34 ms/call
        (probe53) against a 155 ms device step (probe70); production hosts
        pay less per dispatch but multi-ms host gaps are typical at this
        step rate.  Trade-off: metrics surface only every K steps (the
        reference logs every 50, train_sevirlr_prediff.py:1081), and a
        batch arriving late stalls K steps — pair with the prefetch
        pipeline."""
        step = self._train_step_body()

        def multi(state: EmaTrainState, rng, xs, ys):
            def body(st, xy):
                st, mets = step(st, rng, xy[0], xy[1])
                return st, mets

            return jax.lax.scan(body, state, (xs, ys))

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = replicated_sharding(self.mesh)
            data_k = NamedSharding(self.mesh, P(None, "data"))
            return jax.jit(
                multi,
                in_shardings=(repl, repl, data_k, data_k),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
        return jax.jit(multi, donate_argnums=(0,))

    def make_val_step(self, use_ema: bool = True,
                      latent_inputs: Optional[bool] = None):
        """``latent_inputs=False`` forces a pixel-input val step even when
        the trainer trains from a latent cache (validation samples and
        scores forecasts from pixel batches)."""

        def step(state: EmaTrainState, rng, x, y):
            params = state.params
            if use_ema and state.use_ema:
                params = dict(params)
                params["unet"] = state.ema_param_tree()["unet"]
            _, loss_dict = self._loss_fn(params, rng, x, y, False, "val",
                                         latent=latent_inputs)
            return loss_dict

        if self.mesh is not None:
            repl = replicated_sharding(self.mesh)
            data = batch_sharding(self.mesh)
            return jax.jit(step, in_shardings=(repl, repl, data, data),
                           out_shardings=repl)
        return jax.jit(step)

    @property
    def train_step(self):
        if self._train_step is None:
            self._train_step = self.make_train_step()
        return self._train_step

    @property
    def train_step_scan(self):
        if getattr(self, "_train_step_scan", None) is None:
            self._train_step_scan = self.make_train_step_scan()
        return self._train_step_scan

    @property
    def val_step(self):
        if self._val_step is None:
            self._val_step = self.make_val_step()
        return self._val_step


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x)) for x in leaves))
