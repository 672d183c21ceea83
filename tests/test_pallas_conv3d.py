"""Fused conv3x3x3 Pallas kernel: forward + gradient equivalence (interpret
mode on CPU) and the Conv3x3x3 'pallas' dispatch path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.ops import pallas_conv3d


SHAPES = [
    (1, 5, 8, 8, 128, 128),   # sampling-ish stage
    (2, 3, 4, 4, 128, 256),   # B>1 + channel growth
]


def _data(B, T, H, W, C, OC, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.rand(B, T, H, W, C).astype(np.float32)) - 0.5
    k = jnp.asarray(rs.rand(3, 3, 3, C, OC).astype(np.float32)) * 0.05
    b = jnp.asarray(rs.rand(OC).astype(np.float32))
    return x, k, b


@pytest.mark.parametrize("shape", SHAPES)
def test_forward_matches_lax(shape):
    B, T, H, W, C, OC = shape
    assert pallas_conv3d.supports_shape(T, H, W, C, OC)
    x, k, b = _data(*shape)
    ref = pallas_conv3d.conv3x3x3_reference(x, k, b)
    got = pallas_conv3d.fused_conv3x3x3(x, k, b, mxu_dtype_name="float32",
                                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unsupported_shapes_gated():
    # non-128-multiple channels (e.g. the UNet first_proj's C=65)
    assert not pallas_conv3d.supports_shape(13, 16, 16, 65, 256)
    assert not pallas_conv3d.supports_shape(13, 16, 16, 256, 192)
    # VMEM blowup
    assert not pallas_conv3d.supports_shape(13, 64, 64, 1024, 1024)


@pytest.mark.parametrize("shape", SHAPES[:1])
def test_grads_match_xla_autodiff(shape):
    B, T, H, W, C, OC = shape
    x, k, b = _data(*shape, seed=1)
    g = jnp.asarray(np.random.RandomState(2).rand(B, T, H, W, OC)
                    .astype(np.float32)) - 0.5

    def loss_fused(x, k, b):
        out = pallas_conv3d.fused_conv3x3x3_diff(x, k, b, "float32", True)
        return jnp.sum(out * g)

    def loss_ref(x, k, b):
        return jnp.sum(pallas_conv3d.conv3x3x3_reference(x, k, b) * g)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, k, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, bb, name in zip(gf, gr, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_conv3x3x3_module_pallas_path():
    """Conv3x3x3(use_pallas=True) runs the fused kernel (interpret on CPU)
    with an identical param tree and matching numbers."""
    from prediff_tpu.models.layers import Conv3x3x3

    B, T, H, W, C = 1, 3, 4, 4, 128
    x = jnp.asarray(np.random.RandomState(0).rand(B, T, H, W, C)
                    .astype(np.float32))
    plain = Conv3x3x3(features=128)
    fused = Conv3x3x3(features=128, use_pallas=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    out_p = plain.apply(params, x)
    out_f = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               rtol=2e-2, atol=2e-2)  # bf16 MXU operands
    # ineligible shape (C=65) silently falls back to the default lowering
    x65 = jnp.asarray(np.random.RandomState(1).rand(1, 3, 4, 4, 65)
                      .astype(np.float32))
    small = Conv3x3x3(features=128, use_pallas=True)
    p65 = small.init(jax.random.PRNGKey(0), x65)
    ref65 = Conv3x3x3(features=128).apply(p65, x65)
    np.testing.assert_allclose(np.asarray(small.apply(p65, x65)),
                               np.asarray(ref65), rtol=1e-5, atol=1e-5)
