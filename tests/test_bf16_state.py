"""Round-5 bf16 optimizer/EMA STORAGE dtype opt-ins (VERDICT r4 #4).

The custom adam must be bit-equivalent to optax.adamw when the storage
dtype is f32 (same chain, same math), and the bf16 mode must round ONLY
the stores.  Outcome-level A/B lives in scripts/probes/bf16_state_ab.py.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.training.optim import build_optimizer
from prediff_tpu.training.train_state import EmaTrainState

pytestmark = pytest.mark.fast


def _params():
    rs = np.random.RandomState(0)
    return {
        "w": jnp.asarray(rs.randn(8, 16).astype(np.float32) * 0.1),
        "b": jnp.asarray(rs.randn(16).astype(np.float32) * 0.1),
    }


def _grads(seed):
    rs = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rs.randn(8, 16).astype(np.float32) * 0.01),
        "b": jnp.asarray(rs.randn(16).astype(np.float32) * 0.01),
    }


def test_state_dtype_f32_matches_optax_adamw():
    kw = dict(lr=1e-3, total_num_steps=100, wd=1e-5,
              gradient_clip_val=None)
    ref = build_optimizer(**kw)
    got = build_optimizer(state_dtype="float32", **kw)
    p_ref, p_got = _params(), _params()
    s_ref, s_got = ref.init(p_ref), got.init(p_got)
    for i in range(5):
        g = _grads(i)
        u_ref, s_ref = ref.update(g, s_ref, p_ref)
        u_got, s_got = got.update(g, s_got, p_got)
        for k in p_ref:
            np.testing.assert_allclose(np.asarray(u_got[k]),
                                       np.asarray(u_ref[k]),
                                       rtol=1e-6, atol=1e-9)
            p_ref[k] = p_ref[k] + u_ref[k]
            p_got[k] = p_got[k] + u_got[k]


def test_state_dtype_bf16_moments_stored_bf16():
    tx = build_optimizer(lr=1e-3, total_num_steps=100,
                         state_dtype="bfloat16", gradient_clip_val=None)
    def find_adam(state):
        if hasattr(state, "mu"):
            return state
        if isinstance(state, tuple):
            for sub in state:
                got = find_adam(sub)
                if got is not None:
                    return got
        return None

    p = _params()
    s = tx.init(p)
    adam = find_adam(s)
    for leaf in jax.tree_util.tree_leaves((adam.mu, adam.nu)):
        assert leaf.dtype == jnp.bfloat16
    u, s2 = tx.update(_grads(0), s, p)
    adam2 = find_adam(s2)
    for leaf in jax.tree_util.tree_leaves((adam2.mu, adam2.nu)):
        assert leaf.dtype == jnp.bfloat16
    # updates themselves stay f32 and close to the f32-state optimizer's
    ref = build_optimizer(lr=1e-3, total_num_steps=100,
                          gradient_clip_val=None)
    u_ref, _ = ref.update(_grads(0), ref.init(p), p)
    for k in p:
        assert u[k].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(u[k]), np.asarray(u_ref[k]),
                                   rtol=2e-2, atol=1e-8)


def test_ema_dtype_bf16_shadow():
    tx = build_optimizer(lr=1e-2, total_num_steps=100)
    state = EmaTrainState.create(_params(), tx, ema_dtype="bfloat16")
    for leaf in jax.tree_util.tree_leaves(state.ema_params):
        assert leaf.dtype == jnp.bfloat16
    # read-out tree upcasts to the params dtype
    for leaf in jax.tree_util.tree_leaves(state.ema_param_tree()):
        assert leaf.dtype == jnp.float32
    # the shadow moves under updates (no silent freeze at this scale)
    s = state
    for i in range(20):
        s = s.apply_gradients(_grads(i))
    moved = jax.tree_util.tree_map(
        lambda e0, e1: float(jnp.abs(e0.astype(jnp.float32)
                                     - e1.astype(jnp.float32)).max()),
        state.ema_params, s.ema_params)
    assert all(v > 0 for v in jax.tree_util.tree_leaves(moved))
    # and tracks the f32 shadow to bf16 rounding
    s32 = state.replace(ema_dtype=None,
                        ema_params=jax.tree_util.tree_map(
                            lambda x: x.astype(jnp.float32),
                            state.ema_params))
    for i in range(20):
        s32 = s32.apply_gradients(_grads(i))
    for a, b in zip(jax.tree_util.tree_leaves(s.ema_param_tree()),
                    jax.tree_util.tree_leaves(s32.ema_param_tree())):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=1e-3)


def test_ema_dtype_rejects_packed_layouts():
    tx = build_optimizer(lr=1e-3, total_num_steps=10)
    with pytest.raises(ValueError):
        EmaTrainState.create(_params(), tx, ema_dtype="bfloat16",
                             pack_small_thr=1024)
    with pytest.raises(ValueError):
        EmaTrainState.create(_params(), tx, ema_dtype="bfloat16",
                             flat_update=True)
