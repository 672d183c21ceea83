"""Optimizer / LR-schedule factory mirroring the reference's training recipe
(scripts/prediff/sevirlr/train_sevirlr_prediff.py:555-590): AdamW with
linear warmup then cosine decay, global-norm gradient clipping, and
optax.MultiSteps for gradient accumulation (DDP total_batch_size semantics,
:666-683)."""
from typing import Optional

import optax


def build_lr_schedule(
    lr: float,
    total_num_steps: int,
    warmup_percentage: float = 0.1,
    lr_scheduler_mode: str = "cosine",
    min_lr_ratio: float = 1e-3,
    warmup_min_lr_ratio: float = 0.1,
):
    warmup_steps = max(1, int(total_num_steps * warmup_percentage))
    warmup = optax.linear_schedule(
        init_value=lr * warmup_min_lr_ratio, end_value=lr,
        transition_steps=warmup_steps,
    )
    rest = max(1, total_num_steps - warmup_steps)
    if lr_scheduler_mode == "cosine":
        decay = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=rest, alpha=min_lr_ratio,
        )
    elif lr_scheduler_mode == "constant":
        decay = optax.constant_schedule(lr)
    else:
        raise NotImplementedError(f"lr_scheduler_mode '{lr_scheduler_mode}'")
    return optax.join_schedules([warmup, decay], boundaries=[warmup_steps])


def get_loss_fn(loss: str = "l2"):
    """Name -> elementwise loss (ref: utils/optim.py:15)."""
    import jax.numpy as jnp

    if loss in ("l2", "mse"):
        return lambda pred, target: jnp.mean(jnp.square(pred - target))
    if loss in ("l1", "mae"):
        return lambda pred, target: jnp.mean(jnp.abs(pred - target))
    raise NotImplementedError(f"loss '{loss}'")


def _scale_by_adam_state_dtype(b1: float, b2: float, eps: float,
                               state_dtype) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moments STORED in ``state_dtype``
    (optax only offers ``mu_dtype``).  Per-step arithmetic is f32 — read
    moments upcast, update, bias-correct, downcast the store — so the only
    semantics change is the storage rounding.  Round-5 opt-in (VERDICT r4
    #4): the diffusion train step's residual HBM traffic is f32 opt/EMA
    state (probe70/78); bf16 moments halve that component.  Accuracy /
    speed A/B: scripts/probes/bf16_state_ab.py."""
    import jax
    import jax.numpy as jnp

    sdtype = jnp.dtype(state_dtype)

    def _zeros_like(p):
        # non-f32 leaves (none today) keep their dtype, mirroring mu_dtype
        return jnp.zeros_like(p, dtype=sdtype if p.dtype == jnp.float32
                              else p.dtype)

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(_zeros_like, params),
            nu=jax.tree_util.tree_map(_zeros_like, params),
        )

    def update(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m.astype(f32) + (1.0 - b1) * g.astype(f32),
            state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v.astype(f32)
            + (1.0 - b2) * jnp.square(g.astype(f32)),
            state.nu, updates)
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(f32)
        bc2 = 1.0 - b2 ** count.astype(f32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree_util.tree_map(
                lambda m, old: m.astype(old.dtype), mu, state.mu),
            nu=jax.tree_util.tree_map(
                lambda v, old: v.astype(old.dtype), nu, state.nu),
        )
        return out, new_state

    return optax.GradientTransformation(init, update)


def build_optimizer(
    lr: float = 1e-3,
    total_num_steps: int = 100_000,
    method: str = "adamw",
    wd: float = 1e-5,
    betas=(0.9, 0.999),
    gradient_clip_val: Optional[float] = 1.0,
    warmup_percentage: float = 0.1,
    lr_scheduler_mode: str = "cosine",
    min_lr_ratio: float = 1e-3,
    warmup_min_lr_ratio: float = 0.1,
    accum_steps: int = 1,
    state_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    schedule = build_lr_schedule(
        lr, total_num_steps, warmup_percentage, lr_scheduler_mode,
        min_lr_ratio, warmup_min_lr_ratio,
    )
    if state_dtype is not None:
        # same chain optax.adamw/adam builds, with the moment storage swapped
        scaled = _scale_by_adam_state_dtype(betas[0], betas[1], 1e-8,
                                            state_dtype)
        if method == "adamw":
            opt = optax.chain(scaled, optax.add_decayed_weights(wd),
                              optax.scale_by_learning_rate(schedule))
        elif method == "adam":
            opt = optax.chain(scaled, optax.scale_by_learning_rate(schedule))
        else:
            raise NotImplementedError(f"optimizer '{method}'")
    elif method == "adamw":
        opt = optax.adamw(schedule, b1=betas[0], b2=betas[1], weight_decay=wd)
    elif method == "adam":
        opt = optax.adam(schedule, b1=betas[0], b2=betas[1])
    else:
        raise NotImplementedError(f"optimizer '{method}'")
    parts = []
    if gradient_clip_val:
        parts.append(optax.clip_by_global_norm(gradient_clip_val))
    parts.append(opt)
    tx = optax.chain(*parts)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def resolve_prng_impl(flag):
    """'auto' -> 'rbg' on real TPUs (hardware RNG), threefry elsewhere."""
    import jax

    if flag == "auto":
        return "rbg" if jax.default_backend() == "tpu" else None
    return flag


def convert_key_impl(key, impl):
    """Derive an ``impl``-typed PRNG key from ``key`` in-graph.

    'rbg' keys generate bits with the TPU hardware RNG instead of threefry
    ALU rounds — probe40c measured threefry randomness (dropout masks +
    q_sample noise) at 20-35%% of the v1 train step.  The derived key is a
    deterministic function of ``key``, so per-step fold_in reproducibility
    is preserved (under a fixed impl choice)."""
    if impl in (None, "threefry", "threefry2x32"):
        return key
    import jax
    import jax.numpy as jnp

    data = jax.random.bits(key, (4,), jnp.uint32)
    return jax.random.wrap_key_data(data, impl=impl)
