"""Train state with EMA shadow params, as a flax.struct pytree."""
from typing import Any, Optional

import jax
import optax
from flax import struct

from .ema import ema_update


class EmaTrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any]
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    use_ema: bool = struct.field(pytree_node=False, default=True)

    @classmethod
    def create(cls, params, tx, use_ema: bool = True, ema_decay: float = 0.9999):
        import jax.numpy as jnp

        # own copies throughout: train steps donate the state, which would
        # otherwise delete buffers the caller (or a sibling state) still holds
        params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            # real copies — params/ema must not alias or buffer donation breaks
            ema_params=(
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
                if use_ema else None
            ),
            tx=tx,
            ema_decay=ema_decay,
            use_ema=use_ema,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = (
            ema_update(self.ema_params, new_params, self.ema_decay, self.step)
            if self.use_ema else None
        )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
