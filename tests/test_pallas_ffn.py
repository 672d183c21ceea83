"""Fused Pallas FFN kernel: numerics vs the pure-jnp reference and vs the
standard PositionwiseFFN module path (param-tree + output equivalence)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prediff_tpu.ops import pallas_ffn
from prediff_tpu.models.layers import PositionwiseFFN


def _rand_ffn_inputs(tokens, C, hidden, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(tokens, C).astype(np.float32) * 0.5)
    ln_s = jnp.asarray(1.0 + 0.1 * rs.randn(C).astype(np.float32))
    ln_b = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    w1 = jnp.asarray(rs.randn(C, hidden).astype(np.float32) / np.sqrt(C))
    b1 = jnp.asarray(0.1 * rs.randn(hidden).astype(np.float32))
    w2 = jnp.asarray(rs.randn(hidden, C).astype(np.float32) / np.sqrt(hidden))
    b2 = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    return x, ln_s, ln_b, w1, b1, w2, b2


@pytest.mark.parametrize("tokens,C,hidden", [(3328, 256, 1024), (832, 512, 2048)])
@pytest.mark.parametrize("activation", ["gelu", "leaky"])
def test_fused_ffn_matches_reference(tokens, C, hidden, activation):
    args = _rand_ffn_inputs(tokens, C, hidden)
    out = pallas_ffn.fused_ffn(
        *args, activation=activation, mxu_dtype_name="float32", interpret=True
    )
    ref = pallas_ffn.fused_ffn_reference(*args, activation=activation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_ffn_bf16_mxu_close():
    args = _rand_ffn_inputs(416, 256, 1024, seed=1)
    out = pallas_ffn.fused_ffn(*args, mxu_dtype_name="bfloat16", interpret=True)
    ref = pallas_ffn.fused_ffn_reference(*args)
    # bf16 operand rounding (XLA's default f32 matmul precision on TPU)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("activation", ["gelu", "silu", "leaky", "relu"])
def test_fused_ffn_diff_grads_match_xla_autodiff(activation):
    """custom_vjp (Pallas dx kernel + XLA param grads) vs jax.grad of the
    jnp reference, every input cotangent (round-3 verdict #1)."""
    args = _rand_ffn_inputs(416, 256, 1024, seed=2)
    g_out = jnp.asarray(
        np.random.RandomState(9).randn(416, 256).astype(np.float32)
    )

    def loss_fused(*a):
        out = pallas_ffn.fused_ffn_diff(
            *a, 1e-5, activation, "float32", True
        )
        return jnp.sum(out * g_out)  # arbitrary cotangent

    def loss_ref(*a):
        return jnp.sum(
            pallas_ffn.fused_ffn_reference(*a, activation=activation) * g_out
        )

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=n
        )


def test_fused_ffn_diff_input_only_grad():
    """jax.grad wrt x alone (the guidance pattern) works and matches."""
    args = _rand_ffn_inputs(416, 256, 1024, seed=3)

    def energy_fused(x):
        return jnp.sum(jnp.square(pallas_ffn.fused_ffn_diff(
            x, *args[1:], 1e-5, "gelu", "float32", True
        )))

    def energy_ref(x):
        return jnp.sum(jnp.square(pallas_ffn.fused_ffn_reference(x, *args[1:])))

    got = jax.grad(energy_fused)(args[0])
    want = jax.grad(energy_ref)(args[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_erf_approximation_accuracy():
    """A&S 7.1.26 erf (Mosaic has no native erf) vs jax.lax.erf."""
    x = jnp.asarray(np.linspace(-6.0, 6.0, 20001, dtype=np.float32))
    err = np.abs(np.asarray(pallas_ffn._erf(x)) - np.asarray(jax.lax.erf(x)))
    assert err.max() < 1e-6  # 1.5e-7 formula error + f32 evaluation rounding


def test_pick_token_tile():
    assert pallas_ffn.pick_token_tile(3328, 1024) == 832
    assert pallas_ffn.pick_token_tile(832, 2048) == 416
    tm = pallas_ffn.pick_token_tile(13 * 7, 1024)  # 91: no 8-aligned divisor
    assert tm is None
    assert not pallas_ffn.supports_shape(91, 256, 1024)
    assert not pallas_ffn.supports_shape(3328, 250, 1024)  # unaligned C


def test_supports_shape_v1_stages():
    """REGRESSION (probe62): both v1 UNet stages must stay kernel-eligible.
    Round-3's first VMEM gate counted the resident weights at f32 and
    silently pushed the stage-1 FFNs (832 tokens, C=512, hidden=2048,
    ~9.3 MB true footprint) onto the XLA path — a 158 -> 142 steps/s bench
    drop.  The weights live in VMEM at the bf16 MXU dtype (2 bytes)."""
    assert pallas_ffn.supports_shape(3328, 256, 1024)  # stage 0
    assert pallas_ffn.supports_shape(832, 512, 2048)   # stage 1
    # the advisor's oversized example must still fall back (bf16 weights
    # alone are 16.8 MB)
    assert not pallas_ffn.supports_shape(4096, 1024, 4096)


def _randomize(params, seed=11, scale=0.06):
    """Randomize every leaf — ffn_2 is zero-init (mode "2"), which would
    otherwise make the fused-vs-module comparison vacuous."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(seed)
    leaves = [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * scale)
              for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _module_outputs(use_pallas, x5d, params=None):
    ffn = PositionwiseFFN(
        units=256, hidden_size=1024, activation="gelu", pre_norm=True,
        activation_dropout=0.0, dropout=0.0, use_pallas=use_pallas,
    )
    if params is None:
        params = ffn.init(jax.random.PRNGKey(0), x5d)["params"]
    return ffn.apply({"params": params}, x5d), params


def test_positionwise_ffn_fused_path_matches_module():
    """Fused-path output == standard module output on the v1 UNet stage-1
    shape, with an IDENTICAL param tree (checkpoint-conversion invariant)."""
    rs = np.random.RandomState(0)
    x5d = jnp.asarray(rs.randn(1, 13, 16, 16, 256).astype(np.float32) * 0.5)
    _, init_params = _module_outputs(False, x5d)
    _, fused_init = _module_outputs(True, x5d)
    assert jax.tree.structure(init_params) == jax.tree.structure(fused_init)
    # same init values for same rng, whichever path initializes
    for a, b in zip(jax.tree.leaves(init_params), jax.tree.leaves(fused_init)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    rnd = _randomize(init_params)
    ref_out, ref_params = _module_outputs(False, x5d, params=rnd)
    fused_out, fused_params = _module_outputs(True, x5d, params=rnd)
    # fused path uses bf16 MXU operands (matches TPU default matmul precision)
    np.testing.assert_allclose(
        np.asarray(fused_out), np.asarray(ref_out), rtol=3e-2, atol=3e-2
    )
    # shared params are interchangeable across the two paths
    out_cross, _ = _module_outputs(True, x5d, params=ref_params)
    np.testing.assert_array_equal(np.asarray(out_cross), np.asarray(fused_out))


def test_positionwise_ffn_fused_falls_back_when_unsupported():
    """Non-lane-aligned width or train mode must use the standard path."""
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 13, 4, 4, 200).astype(np.float32))
    ffn = PositionwiseFFN(units=200, hidden_size=800, activation="gelu",
                          pre_norm=True, use_pallas=True, dropout=0.0,
                          activation_dropout=0.0)
    params = ffn.init(jax.random.PRNGKey(0), x)["params"]
    out = ffn.apply({"params": params}, x)
    ffn_ref = PositionwiseFFN(units=200, hidden_size=800, activation="gelu",
                              pre_norm=True, use_pallas=False, dropout=0.0,
                              activation_dropout=0.0)
    ref = ffn_ref.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # train mode (deterministic=False) falls back even on supported shapes
    x2 = jnp.asarray(rs.randn(1, 13, 16, 16, 256).astype(np.float32))
    ffn2 = PositionwiseFFN(units=256, hidden_size=1024, activation="gelu",
                           pre_norm=True, use_pallas=True, dropout=0.0,
                           activation_dropout=0.0)
    p2 = ffn2.init(jax.random.PRNGKey(0), x2)["params"]
    out_train = ffn2.apply({"params": p2}, x2, deterministic=False,
                           rngs={"dropout": jax.random.PRNGKey(1)})
    ffn2_ref = PositionwiseFFN(units=256, hidden_size=1024, activation="gelu",
                               pre_norm=True, use_pallas=False, dropout=0.0,
                               activation_dropout=0.0)
    ref_train = ffn2_ref.apply({"params": p2}, x2, deterministic=False,
                               rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(ref_train))


def test_unet_with_fused_ffn_matches_unfused():
    """Whole-UNet forward with use_pallas_ffn vs without, shared params."""
    from prediff_tpu.config import prediff_default_config
    from prediff_tpu.factory import build_unet

    cfg = prediff_default_config()
    cfg.model.latent_model.use_pallas_ffn = False
    unet_ref = build_unet(cfg)
    cfg.model.latent_model.use_pallas_ffn = True
    unet_fused = build_unet(cfg)

    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.randn(1, 6, 16, 16, 64).astype(np.float32))
    zc = jnp.asarray(rs.randn(1, 7, 16, 16, 64).astype(np.float32))
    t = jnp.asarray([5], jnp.int32)
    params = unet_ref.init(jax.random.PRNGKey(0), z, t, zc)["params"]
    params_fused = unet_fused.init(jax.random.PRNGKey(0), z, t, zc)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_fused)

    # randomize every leaf: the v1 init zero-inits ffn_2, which would make
    # the FFN-path comparison vacuous
    params = _randomize(params, seed=3)
    ref = unet_ref.apply({"params": params}, z, t, zc)
    fused = unet_fused.apply({"params": params}, z, t, zc)
    # bf16 MXU operands in the kernel vs f32 CPU matmuls
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize("activation", ["gelu", "silu"])
def test_fused_ffn_full_bwd_grads_match_xla_autodiff(activation):
    """The one-kernel all-grads backward (full_bwd=True, the train path) vs
    jax.grad of the reference, every cotangent — multi-tile tokens so the
    accumulating constant-index-map outputs are exercised across grid steps."""
    tokens, C, hidden = 384, 256, 1024  # tile 128 -> 3 grid steps
    assert pallas_ffn.supports_full_bwd_shape(tokens, C, hidden)
    args = _rand_ffn_inputs(tokens, C, hidden, seed=5)
    g_out = jnp.asarray(
        np.random.RandomState(12).randn(tokens, C).astype(np.float32)
    )

    def loss_fused(*a):
        out = pallas_ffn.fused_ffn_diff(
            *a, 1e-5, activation, "float32", True, True
        )
        return jnp.sum(out * g_out)

    def loss_ref(*a):
        return jnp.sum(
            pallas_ffn.fused_ffn_reference(*a, activation=activation) * g_out
        )

    got = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    want = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ("dx", "dgamma", "dbeta", "dw1", "db1", "dw2", "db2")
    for n, a, b in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4, err_msg=n
        )


def test_full_bwd_gate_v1_stages():
    """Both v1 stages fit the raised-limit full-backward budget."""
    assert pallas_ffn.supports_full_bwd_shape(3328, 256, 1024)
    assert pallas_ffn.supports_full_bwd_shape(832, 512, 2048)


def test_kernel_dropout_gates_off_cpu():
    """In-kernel PRNG dropout is real-TPU only (no interpret lowering for
    pltpu.prng_*): on CPU supports_dropout_shape is False and the module
    falls back to the flax Dropout XLA path bit-exactly."""
    from prediff_tpu.models.layers import PositionwiseFFN
    from prediff_tpu.ops import pallas_ffn

    assert not pallas_ffn.supports_dropout_shape(1024, 256, 1024)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 512, 256)
                    .astype(np.float32))
    kw = dict(units=256, hidden_size=1024, activation="gelu", pre_norm=True,
              dropout=0.1, activation_dropout=0.1)
    base = PositionwiseFFN(**kw)
    fused = PositionwiseFFN(use_pallas=True, use_pallas_dropout=True, **kw)
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    rngs = {"dropout": jax.random.PRNGKey(7)}
    out_b = base.apply({"params": params}, x, deterministic=False, rngs=rngs)
    out_f = fused.apply({"params": params}, x, deterministic=False, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(out_b), np.asarray(out_f))


def test_seed_words_folding():
    from prediff_tpu.ops.pallas_ffn import _seed_words

    two = _seed_words(jnp.asarray([1, 2], jnp.uint32))
    assert two.shape == (2,) and two.dtype == jnp.int32
    four = _seed_words(jnp.asarray([1, 2, 3, 4], jnp.uint32))
    assert four.shape == (2,)
    # distinct rbg key words must not collapse to the same fold
    four_b = _seed_words(jnp.asarray([1, 9, 3, 4], jnp.uint32))
    assert (np.asarray(four) != np.asarray(four_b)).any()
