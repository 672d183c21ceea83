"""Train state with EMA shadow params, as a flax.struct pytree."""
from typing import Any, Optional

import jax
import optax
from flax import struct
from jax.flatten_util import ravel_pytree

from .ema import ema_update


def _small_mask(params, thr: int):
    """Per-leaf bool: pack this leaf into the flat small-vector?  Decided
    from static shape/dtype only, so it is identical at trace and run time
    (and across create/apply).  Non-f32 leaves stay native: concatenation
    would silently upcast them."""
    import jax.numpy as jnp

    return [
        leaf.size <= thr and leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(params)
    ]


def _pack(tree, mask):
    """Split ``tree``'s leaves into one raveled f32 vector (small leaves)
    plus a list of native large leaves.  The result is itself a pytree, so
    optax transforms (clip-by-global-norm, adamw, MultiSteps) and
    ``ema_update`` run on it unchanged — elementwise semantics identical to
    the per-leaf path; only the global-norm reduction order differs."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    small = [l.ravel() for l, s in zip(leaves, mask) if s]
    flat = (jnp.concatenate(small) if small
            else jnp.zeros((0,), jnp.float32))
    large = [l for l, s in zip(leaves, mask) if not s]
    return {"flat": flat, "large": large}


def _unpack(packed, mask, ref_leaves, treedef):
    out = []
    off = 0
    bi = 0
    for ref, s in zip(ref_leaves, mask):
        if s:
            out.append(packed["flat"][off:off + ref.size].reshape(ref.shape))
            off += ref.size
        else:
            out.append(packed["large"][bi])
            bi += 1
    return jax.tree_util.tree_unflatten(treedef, out)


class EmaTrainState(struct.PyTreeNode):
    """Train state with EMA shadow params.

    NOTE: with ``pack_small_thr > 0`` the ``ema_params`` field stores the
    packed ``{'flat', 'large'}`` layout, not a params-shaped tree —
    :meth:`ema_param_tree` is the only supported accessor for EMA weights
    (it unpacks when needed and is the identity otherwise).  ``opt_state``
    is likewise over the packed structure; checkpoints record the layout
    (utils/checkpoint.py) and refuse a mismatched restore."""

    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Optional[Any]
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_decay: float = struct.field(pytree_node=False, default=0.9999)
    use_ema: bool = struct.field(pytree_node=False, default=True)
    # Run clip/optimizer/EMA on ONE raveled vector instead of per-leaf
    # pytrees (one fused update kernel vs 3-4 tiny fusions per param leaf).
    # Semantics are identical (clip is global, adamw/EMA are elementwise);
    # only reduction order inside the global norm differs (last-ulp).
    # Measured 7% SLOWER on a v5e for the v1 config (probe45: the ravel
    # concatenate copies cost more than the dispatch savings), hence
    # default False; kept as an option for many-small-leaves models.
    flat_update: bool = struct.field(pytree_node=False, default=False)
    # Middle ground between per-leaf and flat_update: pack only leaves with
    # <= pack_small_thr elements into ONE flat vector for the
    # clip/adamw/EMA update, keeping the big conv/dense kernels native.
    # probe61 attributed ~22.5 ms of the B=8 train step to ~12k tiny
    # async-copy/slice ops from per-leaf optimizer+EMA traffic; at
    # thr=65536 the v1 UNet packs 454/640 leaves holding only 1.3% of the
    # elements, so the ravel copies flat_update pays (probe45, 7% slower)
    # stay negligible.  EMA shadow params are STORED packed in this mode
    # (read them via ``ema_param_tree()``); opt_state is over the packed
    # structure, so checkpoints are not interchangeable with the per-leaf
    # layout (same caveat as flat_update).  0 = off.
    pack_small_thr: int = struct.field(pytree_node=False, default=0)
    # Round-5 opt-in (VERDICT r4 #4): STORAGE dtype for the EMA shadow —
    # 'bfloat16' halves the shadow's HBM read+write per step.  The update
    # arithmetic stays f32 (ema_update upcasts), only the store rounds;
    # with decay 0.9999 a per-step increment below ~2^-9 of the shadow's
    # magnitude rounds away, so the shadow tracks a slightly LAGGED EMA
    # (quantization A/B: scripts/probes/bf16_state_ab.py).  Checkpoints
    # record the dtype via the state itself; not interchangeable with f32
    # shadows.  None = f32 (reference semantics, utils/ema.py:6).
    ema_dtype: Optional[str] = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, params, tx, use_ema: bool = True, ema_decay: float = 0.9999,
               flat_update: bool = False, pack_small_thr: int = 0,
               ema_dtype: Optional[str] = None):
        import jax.numpy as jnp

        if flat_update and pack_small_thr:
            raise ValueError("flat_update and pack_small_thr are exclusive")
        if ema_dtype is not None and (flat_update or pack_small_thr):
            # ravel/concat would silently upcast the low-precision shadow
            raise ValueError("ema_dtype is incompatible with flat_update / "
                             "pack_small_thr")
        # own copies throughout: train steps donate the state, which would
        # otherwise delete buffers the caller (or a sibling state) still holds
        params = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        if flat_update:
            opt_target = ravel_pytree(params)[0]
        elif pack_small_thr:
            opt_target = _pack(params, _small_mask(params, pack_small_thr))
        else:
            opt_target = params
        if not use_ema:
            ema = None
        elif pack_small_thr:
            # _pack's concatenate + the large-leaf copies give fresh buffers
            ema = _pack(
                jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
                _small_mask(params, pack_small_thr),
            )
        elif ema_dtype is not None:
            ema = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x, dtype=jnp.dtype(ema_dtype)), params)
        else:
            # real copies — params/ema must not alias or buffer donation breaks
            ema = jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(opt_target),
            ema_params=ema,
            tx=tx,
            ema_decay=ema_decay,
            use_ema=use_ema,
            flat_update=flat_update,
            pack_small_thr=pack_small_thr,
            ema_dtype=ema_dtype,
        )

    def pack_like(self, tree):
        """Pack an arbitrary params-shaped tree (e.g. grads) the way this
        state packs its optimizer target.  Identity when packing is off."""
        if not self.pack_small_thr:
            return tree
        return _pack(tree, _small_mask(self.params, self.pack_small_thr))

    def ema_param_tree(self):
        """EMA shadow params as a params-shaped pytree (unpacks the stored
        packed form in pack_small_thr mode; upcasts a low-precision shadow
        back to each param's dtype; identity otherwise)."""
        if self.ema_params is None:
            return None
        if self.ema_dtype is not None:
            return jax.tree_util.tree_map(
                lambda e, p: e.astype(p.dtype), self.ema_params, self.params)
        if not self.pack_small_thr:
            return self.ema_params
        leaves, treedef = jax.tree_util.tree_flatten(self.params)
        mask = _small_mask(self.params, self.pack_small_thr)
        return _unpack(self.ema_params, mask, leaves, treedef)

    def apply_gradients(self, grads):
        if self.flat_update:
            return self._apply_gradients_flat(grads)
        if self.pack_small_thr:
            return self._apply_gradients_packed(grads)
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

    def _apply_gradients_packed(self, grads):
        mask = _small_mask(self.params, self.pack_small_thr)
        leaves, treedef = jax.tree_util.tree_flatten(self.params)
        packed_g = _pack(grads, mask)
        packed_p = _pack(self.params, mask)
        updates, new_opt_state = self.tx.update(
            packed_g, self.opt_state, packed_p)
        new_packed = optax.apply_updates(packed_p, updates)
        new_params = _unpack(new_packed, mask, leaves, treedef)
        new_ema = (
            # elementwise over the packed structure; EMA stays packed
            ema_update(self.ema_params, new_packed, self.ema_decay, self.step)
            if self.use_ema else None
        )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    def _apply_gradients_flat(self, grads):
        flat_g, _ = ravel_pytree(grads)
        flat_p, unravel = ravel_pytree(self.params)
        updates, new_opt_state = self.tx.update(flat_g, self.opt_state, flat_p)
        new_flat = flat_p + updates
        new_ema = None
        if self.use_ema:
            flat_e, unravel_e = ravel_pytree(self.ema_params)
            new_ema = unravel_e(
                ema_update(flat_e, new_flat, self.ema_decay, self.step)
            )
        return self.replace(
            step=self.step + 1,
            params=unravel(new_flat),
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
