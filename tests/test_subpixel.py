"""Sub-pixel decoder upsampler (ops/subpixel.py): exactness vs the
reference formulation (nearest x2 + 3x3 conv, taming/resnet.py:60-143) and
param-tree invariance of the opt-in (`decoder_subpixel`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prediff_tpu.models.vae import AutoencoderKL, Upsample2D
from prediff_tpu.ops.subpixel import (pack_upsample_kernel,
                                      subpixel_upsample_conv)

VAE_KW = dict(
    in_channels=1, out_channels=1,
    down_block_types=("DownEncoderBlock2D",) * 3,
    up_block_types=("UpDecoderBlock2D",) * 3,
    block_out_channels=(16, 32, 32), layers_per_block=1,
    latent_channels=8, norm_num_groups=16,
)


@pytest.mark.fast
def test_subpixel_conv_exact_vs_nearest_conv():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 7, 9, 8).astype(np.float32))
    kernel = jnp.asarray(rs.randn(3, 3, 8, 16).astype(np.float32))
    bias = jnp.asarray(rs.randn(16).astype(np.float32))

    base = Upsample2D(16, subpixel=False)
    params = {"conv": {"kernel": kernel, "bias": bias}}
    ref = base.apply({"params": params}, x)
    got = subpixel_upsample_conv(x, kernel, bias)
    assert got.shape == ref.shape == (2, 14, 18, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # grads through the kernel packing match the baseline conv's
    def loss(fn_params, use_sp):
        mod = Upsample2D(16, subpixel=use_sp)
        return jnp.sum(mod.apply({"params": fn_params}, x) ** 2)

    g_ref = jax.grad(loss)(params, False)
    g_sp = jax.grad(loss)(params, True)
    for key in ("kernel", "bias"):
        np.testing.assert_allclose(
            np.asarray(g_sp["conv"][key]), np.asarray(g_ref["conv"][key]),
            rtol=1e-4, atol=1e-4)


@pytest.mark.fast
def test_subpixel_pack_shapes():
    k = jnp.ones((3, 3, 4, 6), jnp.float32)
    kp = pack_upsample_kernel(k)
    assert kp.shape == (2, 2, 4, 24)
    # every phase's taps sum to the full 3x3 mass (kernel of ones)
    np.testing.assert_allclose(np.asarray(kp).sum(axis=(0, 1)),
                               np.full((4, 24), 9.0), rtol=1e-6)


@pytest.mark.fast
def test_vae_decoder_subpixel_matches_and_keeps_param_tree():
    rs = np.random.RandomState(1)
    z = jnp.asarray(rs.randn(2, 8, 8, 8).astype(np.float32))

    base = AutoencoderKL(**VAE_KW)
    sp = AutoencoderKL(decoder_subpixel=True, **VAE_KW)
    variables = base.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    variables_sp = sp.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))

    # identical tree: same paths, shapes AND init draws (path-keyed RNG)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_sp = jax.tree_util.tree_leaves_with_path(variables_sp["params"])
    assert [(jax.tree_util.keystr(p), l.shape) for p, l in flat] == \
           [(jax.tree_util.keystr(p), l.shape) for p, l in flat_sp]
    for (_, a), (_, b) in zip(flat, flat_sp):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    dec = base.apply(variables, z, method=AutoencoderKL.decode)
    dec_sp = sp.apply(variables, z, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(dec_sp), np.asarray(dec),
                               rtol=1e-4, atol=1e-5)
