"""End-to-end model parity: UNet denoiser, VAE, alignment encoder vs the
PyTorch reference with converted random weights (small configs)."""
import numpy as np
import pytest

from conftest import reference_available, import_reference

if not reference_available():
    pytest.skip("reference not present", allow_module_level=True)

import_reference()
import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prediff_tpu.utils.convert import convert_torch_state_dict  # noqa: E402

torch.manual_seed(0)
RTOL, ATOL = 1e-3, 1e-3


def small_unet_kwargs(num_global_vectors=0):
    return dict(
        input_shape=(7, 8, 8, 8),
        target_shape=(6, 8, 8, 8),
        base_units=16,
        scale_alpha=1.0,
        num_heads=4,
        attn_drop=0.0,
        proj_drop=0.0,
        ffn_drop=0.0,
        downsample=2,
        downsample_type="patch_merge",
        upsample_type="upsample",
        upsample_kernel_size=3,
        depth=[2, 2],
        block_attn_patterns="axial",
        num_global_vectors=num_global_vectors,
        use_dec_self_global=False,
        use_global_vector_ffn=False,
        use_global_self_attn=True,
        separate_global_qkv=True,
        global_dim_ratio=1,
        ffn_activation="gelu",
        gated_ffn=False,
        norm_layer="layer_norm",
        padding_type="zeros",
        pos_embed_type="t+h+w",
        checkpoint_level=0,
        use_relative_pos=True,
        self_attn_use_final_proj=True,
        time_embed_channels_mult=4,
        time_embed_use_scale_shift_norm=False,
        time_embed_dropout=0.0,
        unet_res_connect=True,
    )


@pytest.mark.parametrize("num_global", [0, 2])
def test_unet_parity(num_global):
    from prediff.models.cuboid_transformer.cuboid_transformer_unet import (
        CuboidTransformerUNet as RefUNet,
    )
    from prediff_tpu.models.unet import CuboidTransformerUNet

    kw = small_unet_kwargs(num_global)
    ref_kw = dict(kw)
    ref_kw.pop("use_dec_self_global")
    ref = RefUNet(**ref_kw).eval()
    ours = CuboidTransformerUNet(
        **{k: v for k, v in kw.items() if k not in ("use_dec_self_global",)}
    )
    x = np.random.RandomState(0).randn(2, 6, 8, 8, 8).astype(np.float32)
    cond = np.random.RandomState(1).randn(2, 7, 8, 8, 8).astype(np.float32)
    t = np.array([3, 777], dtype=np.int64)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(cond))
    params = convert_torch_state_dict(ref.state_dict(), variables["params"])
    got = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(t), jnp.asarray(cond))
    with torch.no_grad():
        expected = ref(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(cond)).numpy()
    assert got.shape == expected.shape == (2, 6, 8, 8, 8)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=RTOL, atol=ATOL)


def test_vae_parity():
    from prediff.taming.autoencoder_kl import AutoencoderKL as RefVAE
    from prediff_tpu.models.vae import AutoencoderKL

    kw = dict(
        in_channels=1,
        out_channels=1,
        down_block_types=("DownEncoderBlock2D",) * 3,
        up_block_types=("UpDecoderBlock2D",) * 3,
        block_out_channels=(16, 32, 32),
        layers_per_block=1,
        latent_channels=8,
        norm_num_groups=16,
    )
    ref = RefVAE(act_fn="silu", **kw).eval()
    ours = AutoencoderKL(**kw)
    x = np.random.RandomState(2).randn(2, 32, 32, 1).astype(np.float32)
    x_torch = torch.from_numpy(x.transpose(0, 3, 1, 2))

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = convert_torch_state_dict(ref.state_dict(), variables["params"])

    # encode parity (posterior moments)
    post = ours.apply({"params": params}, jnp.asarray(x), method=AutoencoderKL.encode)
    with torch.no_grad():
        ref_post = ref.encode(x_torch)
    np.testing.assert_allclose(
        np.asarray(post.mean), ref_post.mean.numpy().transpose(0, 2, 3, 1),
        rtol=RTOL, atol=ATOL,
    )
    np.testing.assert_allclose(
        np.asarray(post.logvar), ref_post.logvar.numpy().transpose(0, 2, 3, 1),
        rtol=RTOL, atol=ATOL,
    )

    # decode parity (mode latent)
    z = post.mode()
    dec = ours.apply({"params": params}, z, method=AutoencoderKL.decode)
    with torch.no_grad():
        ref_dec = ref.decode(ref_post.mode()).numpy().transpose(0, 2, 3, 1)
    assert dec.shape == (2, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(dec), ref_dec, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("readout_seq,num_global", [(True, 0), (False, 0), (True, 2)])
def test_alignment_encoder_parity(readout_seq, num_global):
    from prediff.diffusion.knowledge_alignment.models import (
        NoisyCuboidTransformerEncoder as RefEnc,
    )
    from prediff_tpu.models.alignment import NoisyCuboidTransformerEncoder

    kw = dict(
        input_shape=(6, 8, 8, 8),
        out_channels=1,
        base_units=16,
        depth=[1, 1],
        downsample=2,
        downsample_type="patch_merge",
        block_attn_patterns="axial",
        num_heads=4,
        attn_drop=0.0,
        proj_drop=0.0,
        ffn_drop=0.0,
        ffn_activation="gelu",
        gated_ffn=False,
        norm_layer="layer_norm",
        use_inter_ffn=True,
        hierarchical_pos_embed=False,
        pos_embed_type="t+h+w",
        padding_type="zeros",
        checkpoint_level=0,
        use_relative_pos=True,
        self_attn_use_final_proj=True,
        num_global_vectors=num_global,
        use_global_vector_ffn=True,
        use_global_self_attn=False,
        separate_global_qkv=num_global > 0,
        global_dim_ratio=1,
        time_embed_channels_mult=4,
        time_embed_use_scale_shift_norm=False,
        time_embed_dropout=0.0,
        pool="attention",
        readout_seq=readout_seq,
        out_len=4 if readout_seq else None,
    )
    ref = RefEnc(**kw).eval()
    ours = NoisyCuboidTransformerEncoder(**kw)
    x = np.random.RandomState(3).randn(2, 6, 8, 8, 8).astype(np.float32)
    t = np.array([10, 500], dtype=np.int64)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    params = convert_torch_state_dict(ref.state_dict(), variables["params"])
    got = ours.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    with torch.no_grad():
        expected = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), expected, rtol=RTOL, atol=ATOL)
