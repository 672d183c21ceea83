"""Knowledge-alignment guidance THROUGH the fused Pallas kernels (round-3):
``jax.grad`` of the alignment energy wrt z_t must work and match the XLA
einsum path when the alignment network runs with every fused kernel enabled.

Round-2 locked the kernels out of the alignment net because they defined no
VJP (factory.py then); the custom_vjp kernels remove that restriction."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.models.alignment import NoisyCuboidTransformerEncoder
from prediff_tpu.diffusion.knowledge_alignment import KnowledgeAlignment


KW = dict(
    input_shape=(2, 8, 8, 64), out_channels=1, base_units=128,
    depth=[1, 1], downsample=2, block_attn_patterns="axial", num_heads=4,
    attn_drop=0.0, proj_drop=0.0, ffn_drop=0.0, ffn_activation="gelu",
    padding_type="zeros", readout_seq=True, out_len=2,
)


def _randomize(params, seed=17, scale=0.05):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(seed)
    leaves = [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * scale)
              for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


@pytest.fixture(scope="module")
def setup():
    base = NoisyCuboidTransformerEncoder(**KW)
    fused = NoisyCuboidTransformerEncoder(
        use_pallas_attention="layer", use_pallas_ffn=True, use_pallas_gn=True,
        use_pallas_conv=True, use_pallas_resblock=True,
        **KW,
    )
    rng = jax.random.PRNGKey(0)
    zt = jnp.asarray(np.random.RandomState(1).randn(2, 2, 8, 8, 64)
                     .astype(np.float32) * 0.5)
    t = jnp.asarray([3, 7], jnp.int32)
    params = _randomize(base.init(rng, zt, t)["params"])
    # the fused path must create the IDENTICAL param tree
    params_fused = fused.init(rng, zt, t)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_fused))
    return base, fused, params, zt, t


def test_fused_alignment_forward_matches(setup):
    base, fused, params, zt, t = setup
    out_b = base.apply({"params": params}, zt, t)
    out_f = fused.apply({"params": params}, zt, t)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_b),
                               rtol=3e-2, atol=3e-2)


def test_guidance_mean_shift_matches_xla_path(setup):
    base, fused, params, zt, t = setup
    avg_x_gt = jnp.asarray([[0.4], [0.6]], jnp.float32)

    def shift(model):
        ka = KnowledgeAlignment(params=params, guide_scale=1.0,
                                apply_fn=model.apply)
        return ka.get_mean_shift(zt, t, avg_x_gt)

    s_base, s_fused = shift(base), shift(fused)
    assert np.isfinite(np.asarray(s_fused)).all()
    # same scale-of-signal tolerance as the forward (bf16 MXU kernels)
    denom = float(jnp.abs(s_base).max())
    np.testing.assert_allclose(np.asarray(s_fused) / denom,
                               np.asarray(s_base) / denom,
                               rtol=5e-2, atol=5e-2)


def test_guidance_bf16_compute_dtype(setup):
    """compute_dtype='bfloat16' guidance: f32 output dtype, finite, and the
    shift direction matches the f32 path (the shift is a scaled gradient
    direction, so the bar is directional agreement, not elementwise)."""
    base, _, params, zt, t = setup
    avg_x_gt = jnp.asarray([[0.4], [0.6]], jnp.float32)
    ka32 = KnowledgeAlignment(params=params, guide_scale=1.0,
                              apply_fn=base.apply)
    ka16 = KnowledgeAlignment(params=params, guide_scale=1.0,
                              apply_fn=base.apply, compute_dtype="bfloat16")
    s32 = ka32.get_mean_shift(zt, t, avg_x_gt)
    s16 = ka16.get_mean_shift(zt, t, avg_x_gt)
    assert s16.dtype == zt.dtype
    assert np.isfinite(np.asarray(s16)).all()
    a = np.asarray(s32, np.float32).ravel()
    b = np.asarray(s16, np.float32).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
    # zero-error knowledge (pred == avg exactly) must not blow up the
    # sqrt-eps gradient in low precision
    with jax.disable_jit():
        pred = ka16.predict(zt, t)
    avg_exact = np.asarray(pred, np.float32).mean(axis=1)
    s0 = ka16.get_mean_shift(zt, t, jnp.asarray(avg_exact))
    assert np.isfinite(np.asarray(s0)).all()
