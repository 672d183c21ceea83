"""Exponential moving average of params (ref: src/prediff/utils/ema.py:6).

The reference's LitEma keeps shadow buffers inside an nn.Module; here the EMA
is a pure pytree update inside the jitted train step:
  decay_eff = min(decay, (1 + n) / (10 + n))   (warmup ramp)
  shadow   -= (1 - decay_eff) * (shadow - params)
"""
import jax
import jax.numpy as jnp


def ema_decay(decay: float, num_updates: jnp.ndarray) -> jnp.ndarray:
    """Warmup-ramped effective decay; pass num_updates < 0 to disable ramp."""
    n = num_updates.astype(jnp.float32)
    ramped = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jnp.where(num_updates >= 0, ramped, decay)


def ema_update(ema_params, new_params, decay: float, num_updates):
    """Shadow update.  Dtype contract (round-5 ``ema_dtype`` opt-in): the
    arithmetic runs at the PARAMS dtype (f32 in practice) and the result is
    cast back to each shadow leaf's own storage dtype — so a bf16-stored
    shadow still accumulates its per-step increment at full precision and
    only the final store rounds.  No-op for the default all-f32 state."""
    d = ema_decay(decay, jnp.asarray(num_updates))
    return jax.tree_util.tree_map(
        lambda e, p: (e.astype(p.dtype) - (1.0 - d)
                      * (e.astype(p.dtype) - p)).astype(e.dtype),
        ema_params, new_params,
    )
