"""Fused whole-resblock Pallas kernel: numerics vs the pure-jnp reference,
gradients vs XLA autodiff, and module-path equivalence (param tree + output),
all in CPU interpret mode (round-3 guidance op-count lever)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prediff_tpu.ops import pallas_resblock
from prediff_tpu.models.layers import TimeEmbedResBlock


def _rand_inputs(B, T, H, W, C, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, T, H, W, C).astype(np.float32) * 0.5)
    emb = jnp.asarray(rs.randn(B, C).astype(np.float32) * 0.3)
    k1 = jnp.asarray(rs.randn(3, 3, 3, C, C).astype(np.float32) / np.sqrt(27 * C))
    b1 = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    k2 = jnp.asarray(rs.randn(3, 3, 3, C, C).astype(np.float32) / np.sqrt(27 * C))
    b2 = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    g1s = jnp.asarray(1.0 + 0.1 * rs.randn(C).astype(np.float32))
    g1b = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    g2s = jnp.asarray(1.0 + 0.1 * rs.randn(C).astype(np.float32))
    g2b = jnp.asarray(0.1 * rs.randn(C).astype(np.float32))
    return x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b


# (6,16,16,128) / (6,8,8,256) are the alignment network's two resblock
# shapes (the kernel's production target); the small one keeps CI fast.
@pytest.mark.parametrize("B,T,H,W,C", [(1, 2, 4, 4, 128), (2, 3, 4, 4, 128)])
def test_fused_resblock_matches_reference(B, T, H, W, C):
    args = _rand_inputs(B, T, H, W, C)
    assert pallas_resblock.supports_shape(T, H, W, C, C, 32, B=B)
    out, _ = pallas_resblock.fused_resblock(
        *args, groups=32, mxu_dtype_name="float32", interpret=True)
    ref = pallas_resblock.resblock_reference(*args, groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_resblock_multirow_tiles():
    """Alignment stage-0 geometry: multiple conv row tiles + stat tiles."""
    args = _rand_inputs(1, 6, 16, 16, 128, seed=3)
    out, _ = pallas_resblock.fused_resblock(
        *args, groups=32, mxu_dtype_name="float32", interpret=True)
    ref = pallas_resblock.resblock_reference(*args, groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_resblock_bf16_close():
    args = _rand_inputs(1, 2, 4, 4, 128, seed=1)
    out, _ = pallas_resblock.fused_resblock(
        *args, groups=32, mxu_dtype_name="bfloat16", interpret=True)
    ref = pallas_resblock.resblock_reference(*args, groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=4e-2, atol=4e-2)


@pytest.mark.parametrize("B,T,H,W,C", [(1, 2, 4, 4, 128), (2, 2, 4, 4, 128)])
def test_fused_resblock_diff_grads_match_xla_autodiff(B, T, H, W, C):
    """custom_vjp (fused bwd kernel for dx/demb + XLA param grads) vs
    jax.grad of the jnp reference, every input cotangent."""
    args = _rand_inputs(B, T, H, W, C, seed=2)
    g_out = jnp.asarray(
        np.random.RandomState(9).randn(B, T, H, W, C).astype(np.float32))

    def loss_fused(*a):
        return jnp.sum(pallas_resblock.fused_resblock_diff(
            *a, 32, 1e-5, "float32", True) * g_out)

    def loss_ref(*a):
        return jnp.sum(
            pallas_resblock.resblock_reference(*a, groups=32) * g_out)

    argnums = tuple(range(10))
    gf = jax.grad(loss_fused, argnums=argnums)(*args)
    gr = jax.grad(loss_ref, argnums=argnums)(*args)
    names = ["x", "emb", "k1", "b1", "k2", "b2", "g1s", "g1b", "g2s", "g2b"]
    for n, a, b in zip(names, gf, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=f"grad wrt {n}")


def test_fused_resblock_bwd_over_budget_falls_back(monkeypatch):
    """Shapes whose backward exceeds the VMEM budget still differentiate
    (XLA-recompute dx path in _diff_bwd).  A real instance: the 256-channel
    alignment resblock at single-chip ensemble batch 8."""
    assert not pallas_resblock.supports_bwd_shape(6, 8, 8, 256, 32, B=8)
    B, T, H, W, C = 1, 2, 4, 4, 128
    args = _rand_inputs(B, T, H, W, C, seed=4)
    monkeypatch.setattr(pallas_resblock, "supports_bwd_shape",
                        lambda *a, **k: False)
    g_out = jnp.ones((B, T, H, W, C), jnp.float32)
    gx = jax.grad(lambda x: jnp.sum(pallas_resblock.fused_resblock_diff(
        x, *args[1:], 32, 1e-5, "float32", True) * g_out))(args[0])
    gr = jax.grad(lambda x: jnp.sum(pallas_resblock.resblock_reference(
        x, *args[1:], groups=32) * g_out))(args[0])
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gr),
                               rtol=5e-4, atol=5e-4)


def test_module_fused_path_param_tree_and_output():
    """TimeEmbedResBlock(use_pallas_resblock=True) builds the identical param
    tree and matches the standard module path."""
    B, T, H, W, C = 1, 2, 4, 4, 128
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, H, W, C)
                    .astype(np.float32) * 0.5)
    emb = jnp.asarray(np.random.RandomState(1).randn(B, 16)
                      .astype(np.float32))
    kw = dict(channels=C, out_channels=C, emb_channels=16, use_embed=True,
              dropout=0.0)
    base = TimeEmbedResBlock(**kw)
    fused = TimeEmbedResBlock(use_pallas_resblock=True, **kw)
    rng = jax.random.PRNGKey(0)
    params = base.init(rng, x, emb)["params"]
    params_f = fused.init(rng, x, emb)["params"]
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))
    # randomize every leaf (zero-init out conv would make this vacuous)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(7)
    params = jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * 0.1)
                  for l in leaves])
    out_b = base.apply({"params": params}, x, emb)
    out_f = fused.apply({"params": params}, x, emb)
    # bf16 MXU operands inside the kernel
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_b),
                               rtol=4e-2, atol=4e-2)


def test_unet_shapes_over_budget():
    """The UNet's resblock working sets exceed the VMEM budget -> the 'auto'
    flag must leave them on the t2d path."""
    assert not pallas_resblock.supports_shape(13, 16, 16, 256, 256, 32, B=1)
    assert not pallas_resblock.supports_shape(13, 8, 8, 512, 512, 32, B=1)
    # the alignment network's two resblocks are the production targets
    assert pallas_resblock.supports_shape(6, 16, 16, 128, 128, 32, B=1)
    assert pallas_resblock.supports_shape(6, 8, 8, 256, 256, 32, B=1)
    assert pallas_resblock.supports_bwd_shape(6, 16, 16, 128, 32, B=1)
    assert pallas_resblock.supports_bwd_shape(6, 8, 8, 256, 32, B=1)
