"""Frame-wise KL autoencoder (flax.linen, NHWC).

Reference parity: AutoencoderKL (src/prediff/taming/autoencoder_kl.py:9),
Encoder/Decoder (taming/vae.py:9,89), blocks (taming/unet_2d_blocks.py),
ResnetBlock2D (taming/resnet.py:367), single-head AttentionBlock
(taming/attention.py:48).  SEVIR-LR v1 config: block_out_channels
[128,256,512,512], latent_channels 64, layers_per_block 2
(scripts/vae/sevirlr/vae_sevirlr_v1.yaml).

All convs are NHWC; GroupNorm eps 1e-6; module names mirror the torch
attribute paths for mechanical checkpoint conversion.
"""
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dispatch import resolve_auto
from ..ops.subpixel import subpixel_upsample_conv
from ..utils.distributions import DiagonalGaussianDistribution
from .layers import nearest_resize_2d


class ResnetBlock2D(nn.Module):
    out_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    output_scale_factor: float = 1.0
    use_conv_shortcut: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        out_channels = self.out_channels or in_channels
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm1")(x)
        h = jax.nn.silu(h)
        h = nn.Conv(out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps, name="norm2")(h)
        h = jax.nn.silu(h)
        h = nn.Conv(out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_channels != out_channels:
            if self.use_conv_shortcut:
                x = nn.Conv(out_channels, (3, 3), padding=1, name="conv_shortcut")(x)
            else:
                x = nn.Conv(out_channels, (1, 1), name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


class Downsample2D(nn.Module):
    """Stride-2 conv downsample with asymmetric right/bottom padding
    (ref: taming/resnet.py:146-190, padding=0 + manual (0,1,0,1) pad)."""

    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)),
            name="conv",
        )(x)


class _Conv3x3Params(nn.Module):
    """Parameter-only stand-in for ``nn.Conv(features, (3,3))``: identical
    param names/shapes/initializers (kernel lecun_normal, bias zeros) so the
    tree — and torch-checkpoint conversion — is unchanged when the sub-pixel
    path owns the compute instead of nn.Conv."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,))
        return kernel, bias


class Upsample2D(nn.Module):
    """x2 nearest upsample + 3x3 conv (ref: taming/resnet.py:60-143).

    ``subpixel`` (False / True / "auto" = real TPU only) computes the same
    function as one VALID 2x2 conv at the INPUT resolution with 4x output
    channels + phase interleave (ops/subpixel.py): 2.25x fewer MACs and an
    MXU-friendlier channel count than the 3x3 conv at the doubled
    resolution.  Exact in f32 (probe79: 3e-7); on TPU it differs only at
    the bf16 rounding the excess-precision toolchain applies everywhere."""

    out_channels: int
    subpixel: Union[bool, str] = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if resolve_auto(self.subpixel):
            kernel, bias = _Conv3x3Params(self.out_channels, name="conv")(C)
            return subpixel_upsample_conv(x, kernel, bias)
        x = nearest_resize_2d(x, 2 * H, 2 * W)
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv")(x)


class AttentionBlock(nn.Module):
    """Single-head spatial self-attention over (H*W) tokens."""

    norm_num_groups: int = 32
    num_head_channels: Optional[int] = None
    rescale_output_factor: float = 1.0
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        num_heads = C // self.num_head_channels if self.num_head_channels else 1
        residual = x
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=self.eps,
                         name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, name="query")(h)
        k = nn.Dense(C, name="key")(h)
        v = nn.Dense(C, name="value")(h)
        head_dim = C // num_heads
        q = q.reshape(B, H * W, num_heads, head_dim)
        k = k.reshape(B, H * W, num_heads, head_dim)
        v = v.reshape(B, H * W, num_heads, head_dim)
        # weakly-typed scale: a strongly-f32 scalar would promote the whole
        # stream to f32 for the rest of the network, silently undoing
        # bf16-compute mode downstream (softmax below still runs f32)
        scale = float(head_dim) ** -0.5
        scores = jnp.einsum("bihc,bjhc->bhij", q, k) * scale
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(scores.dtype)
        h = jnp.einsum("bhij,bjhc->bihc", probs, v).reshape(B, H * W, C)
        h = nn.Dense(C, name="proj_attn")(h)
        h = h.reshape(B, H, W, C)
        return (h + residual) / self.rescale_output_factor


class DownEncoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 1
    resnet_groups: int = 32
    resnet_eps: float = 1e-6
    add_downsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                out_channels=self.out_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, name=f"resnets_{j}",
            )(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, name="downsamplers_0")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 1
    resnet_groups: int = 32
    resnet_eps: float = 1e-6
    add_upsample: bool = True
    upsample_subpixel: Union[bool, str] = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                out_channels=self.out_channels, groups=self.resnet_groups,
                eps=self.resnet_eps, name=f"resnets_{j}",
            )(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, subpixel=self.upsample_subpixel,
                           name="upsamplers_0")(x)
        return x


class UNetMidBlock2D(nn.Module):
    num_layers: int = 1
    resnet_groups: int = 32
    resnet_eps: float = 1e-6
    add_attention: bool = True
    attn_num_head_channels: Optional[int] = None
    output_scale_factor: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ResnetBlock2D(
            out_channels=x.shape[-1], groups=self.resnet_groups, eps=self.resnet_eps,
            output_scale_factor=self.output_scale_factor, name="resnets_0",
        )(x)
        for j in range(self.num_layers):
            if self.add_attention:
                x = AttentionBlock(
                    norm_num_groups=self.resnet_groups,
                    num_head_channels=self.attn_num_head_channels,
                    rescale_output_factor=self.output_scale_factor,
                    eps=self.resnet_eps,
                    name=f"attentions_{j}",
                )(x)
            x = ResnetBlock2D(
                out_channels=x.shape[-1], groups=self.resnet_groups, eps=self.resnet_eps,
                output_scale_factor=self.output_scale_factor, name=f"resnets_{j + 1}",
            )(x)
        return x


class Encoder(nn.Module):
    out_channels: int = 3  # latent channels
    down_block_types: Sequence[str] = ("DownEncoderBlock2D",)
    block_out_channels: Sequence[int] = (64,)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    double_z: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1, name="conv_in")(x)
        for i, block_type in enumerate(self.down_block_types):
            assert block_type == "DownEncoderBlock2D", f"unsupported {block_type}"
            is_final = i == len(self.block_out_channels) - 1
            x = DownEncoderBlock2D(
                out_channels=self.block_out_channels[i],
                num_layers=self.layers_per_block,
                resnet_groups=self.norm_num_groups,
                add_downsample=not is_final,
                name=f"down_blocks_{i}",
            )(x)
        x = UNetMidBlock2D(
            resnet_groups=self.norm_num_groups, name="mid_block",
        )(x)
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        conv_out_channels = 2 * self.out_channels if self.double_z else self.out_channels
        return nn.Conv(conv_out_channels, (3, 3), padding=1, name="conv_out")(x)


class Decoder(nn.Module):
    out_channels: int = 3
    up_block_types: Sequence[str] = ("UpDecoderBlock2D",)
    block_out_channels: Sequence[int] = (64,)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    upsample_subpixel: Union[bool, str] = False

    @nn.compact
    def __call__(self, z: jnp.ndarray, return_features: bool = False):
        x = nn.Conv(self.block_out_channels[-1], (3, 3), padding=1, name="conv_in")(z)
        x = UNetMidBlock2D(
            resnet_groups=self.norm_num_groups, name="mid_block",
        )(x)
        reversed_channels = list(reversed(self.block_out_channels))
        for i, block_type in enumerate(self.up_block_types):
            assert block_type == "UpDecoderBlock2D", f"unsupported {block_type}"
            is_final = i == len(self.block_out_channels) - 1
            x = UpDecoderBlock2D(
                out_channels=reversed_channels[i],
                num_layers=self.layers_per_block + 1,
                resnet_groups=self.norm_num_groups,
                add_upsample=not is_final,
                upsample_subpixel=self.upsample_subpixel,
                name=f"up_blocks_{i}",
            )(x)
        x = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         name="conv_norm_out")(x)
        x = jax.nn.silu(x)
        out = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out")(x)
        if return_features:
            # pre-conv_out features: the GAN adaptive weight differentiates
            # wrt the final conv kernel only (contperceptual.py:58-68)
            return out, x
        return out


class AutoencoderKL(nn.Module):
    """KL autoencoder; ``__call__`` routes by ``method`` so a single params
    tree serves encode / decode / full passes:

      model.apply(vars, x, method=AutoencoderKL.encode)  -> DiagonalGaussian
      model.apply(vars, z, method=AutoencoderKL.decode)  -> reconstruction
    """

    in_channels: int = 3
    out_channels: int = 3
    down_block_types: Sequence[str] = ("DownEncoderBlock2D",)
    up_block_types: Sequence[str] = ("UpDecoderBlock2D",)
    block_out_channels: Sequence[int] = (64,)
    layers_per_block: int = 1
    latent_channels: int = 4
    norm_num_groups: int = 32
    # False / True / "auto" (real TPU only): sub-pixel decoder upsamplers —
    # same function, 2.25x fewer upsampler MACs (ops/subpixel.py, probe79)
    decoder_subpixel: Union[bool, str] = False

    def setup(self):
        self.encoder = Encoder(
            out_channels=self.latent_channels,
            down_block_types=tuple(self.down_block_types),
            block_out_channels=tuple(self.block_out_channels),
            layers_per_block=self.layers_per_block,
            norm_num_groups=self.norm_num_groups,
            double_z=True,
        )
        self.decoder = Decoder(
            out_channels=self.out_channels,
            up_block_types=tuple(self.up_block_types),
            block_out_channels=tuple(self.block_out_channels),
            layers_per_block=self.layers_per_block,
            norm_num_groups=self.norm_num_groups,
            upsample_subpixel=self.decoder_subpixel,
        )
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1), name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> DiagonalGaussianDistribution:
        h = self.encoder(x)
        moments = self.quant_conv(h)
        return DiagonalGaussianDistribution.from_parameters(moments)

    def encode_moments(self, x: jnp.ndarray) -> jnp.ndarray:
        """Raw (mean ‖ logvar) moments — handy for jitted pipelines."""
        return self.quant_conv(self.encoder(x))

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z))

    def decode_with_features(self, z: jnp.ndarray):
        """(reconstruction, pre-conv_out features) — for the GAN adaptive
        weight, which needs d(loss)/d(conv_out kernel) only."""
        return self.decoder(self.post_quant_conv(z), return_features=True)

    def __call__(self, sample: jnp.ndarray, sample_posterior: bool = False,
                 rng: Optional[jax.Array] = None):
        posterior = self.encode(sample)
        if sample_posterior:
            assert rng is not None
            z = posterior.sample(rng)
        else:
            z = posterior.mode()
        dec = self.decode(z)
        return dec, posterior
