"""Neural building blocks (flax.linen), channel-last NTHWC throughout.

Reference parity:
  PosEmbed               cuboid_transformer.py:18
  PositionwiseFFN        cuboid_transformer.py:93
  PatchMerging3D         cuboid_transformer.py:211
  Upsample3DLayer        cuboid_transformer.py:299
  TimeEmbedLayer         time_embed.py:9
  TimeEmbedResBlock      time_embed.py:31 (operates NCTHW there; NTHWC here)
  timestep_embedding     models/utils.py:68

Flax submodule names mirror the torch attribute paths (with list indices
merged, e.g. torch ``layer.0`` -> flax ``layer_0``) so checkpoint conversion
is mechanical (see prediff_tpu/utils/convert.py).
"""
import contextlib
import contextvars
import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .init import linear_init, conv_init, embed_init


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal embeddings: (B,) -> (B, dim); cos first (ref convention)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate([embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


def get_activation(act: Optional[str]):
    if act is None or act == "identity":
        return lambda x: x
    table = {
        "leaky": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
        "elu": jax.nn.elu,
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "relu": jax.nn.relu,
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softrelu": jax.nn.softplus,
        "softplus": jax.nn.softplus,
        "softsign": jax.nn.soft_sign,
        "silu": jax.nn.silu,
        "swish": jax.nn.silu,
    }
    if act not in table:
        raise NotImplementedError(f"activation '{act}'")
    return table[act]


def nearest_resize_2d(x: jnp.ndarray, H_new: int, W_new: int) -> jnp.ndarray:
    """Nearest-neighbor resize over H, W of (..., H, W, C); torch index math."""
    H, W = x.shape[-3], x.shape[-2]
    h_idx = (np.arange(H_new) * H) // H_new
    w_idx = (np.arange(W_new) * W) // W_new
    return x[..., h_idx, :, :][..., w_idx, :]


class PosEmbed(nn.Module):
    """Learned absolute T/H/W position embeddings added to (B,T,H,W,C)."""

    embed_dim: int
    maxT: int
    maxH: int
    maxW: int
    typ: str = "t+h+w"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.typ in ("t+h+w", "t+hw")
        _, T, H, W, _ = x.shape
        t_idx = jnp.arange(T)
        if self.typ == "t+h+w":
            t_emb = nn.Embed(self.maxT, self.embed_dim, name="T_embed",
                             embedding_init=embed_init())(t_idx)
            h_emb = nn.Embed(self.maxH, self.embed_dim, name="H_embed",
                             embedding_init=embed_init())(jnp.arange(H))
            w_emb = nn.Embed(self.maxW, self.embed_dim, name="W_embed",
                             embedding_init=embed_init())(jnp.arange(W))
            return (
                x
                + t_emb.reshape(T, 1, 1, self.embed_dim)
                + h_emb.reshape(1, H, 1, self.embed_dim)
                + w_emb.reshape(1, 1, W, self.embed_dim)
            )
        else:
            t_emb = nn.Embed(self.maxT, self.embed_dim, name="T_embed",
                             embedding_init=embed_init())(t_idx)
            spatial_idx = jnp.arange(H)[:, None] * self.maxW + jnp.arange(W)
            hw_emb = nn.Embed(self.maxH * self.maxW, self.embed_dim, name="HW_embed",
                              embedding_init=embed_init())(spatial_idx)
            return x + t_emb.reshape(T, 1, 1, self.embed_dim) + hw_emb


class _ParamHolder(nn.Module):
    """Creates params under this module's name without running the op —
    lets fused kernels consume raw weights while keeping the exact param tree
    of the standard nn.Dense / nn.LayerNorm children."""

    leaves: Tuple  # ((leaf_name, shape, init), ...)

    @nn.compact
    def __call__(self):
        return tuple(self.param(n, init, shape) for n, shape, init in self.leaves)


class PositionwiseFFN(nn.Module):
    """Transformer FFN with optional gating and pre/post LayerNorm."""

    units: int = 512
    hidden_size: int = 2048
    activation_dropout: float = 0.0
    dropout: float = 0.1
    gated_proj: bool = False
    activation: str = "relu"
    normalization: str = "layer_norm"
    layer_norm_eps: float = 1e-5
    pre_norm: bool = False
    use_pallas: Union[bool, str] = False
    # in-kernel PRNG dropout (round-4): lets the fused kernel serve ACTIVE-
    # dropout training (the v1 recipe).  'auto' = real TPU only; masks come
    # from the TPU PRNG, not flax Dropout draws (validated on-chip by
    # probe67; +45% over the XLA v1 path, probe68).
    use_pallas_dropout: Union[bool, str] = "auto"
    linear_init_mode: str = "0"
    ffn2_linear_init_mode: str = "2"

    def _try_fused(self, data: jnp.ndarray, deterministic: bool):
        """Whole-FFN Pallas kernel (LN+ffn_1+act+ffn_2+residual in one op) for
        the pre-norm non-gated case; returns None to fall back.

        Differentiable (round-3): ``fused_ffn_diff`` carries a custom_vjp
        (fused Pallas dx kernel + XLA-recomputed param grads), so the kernel
        also serves the train path and guidance gradients — EXCEPT when this
        module's dropout is active (rate > 0 and not deterministic): the
        kernel computes the deterministic function, so dropout training keeps
        the XLA path."""
        from ..ops import pallas_ffn
        from ..ops.dispatch import resolve_auto

        # 'auto' resolves at trace time (see ops/dispatch.py)
        if not (resolve_auto(self.use_pallas) and self.pre_norm
                and not self.gated_proj):
            return None
        if self.activation not in pallas_ffn.SUPPORTED_ACTIVATIONS:
            return None
        C = data.shape[-1]
        tokens = int(np.prod(data.shape[:-1]))
        dropout_active = not deterministic and (
            self.activation_dropout > 0.0 or self.dropout > 0.0
        )
        if dropout_active:
            # round-4: in-kernel PRNG dropout serves the v1 dropout recipe
            # when enabled; otherwise keep flax Dropout semantics (XLA)
            if not (resolve_auto(self.use_pallas_dropout)
                    and pallas_ffn.supports_dropout_shape(
                        tokens, C, self.hidden_size)):
                return None
        if C != self.units or not pallas_ffn.supports_shape(tokens, C, self.hidden_size):
            return None
        (ln_scale, ln_bias) = _ParamHolder(
            leaves=(("scale", (C,), nn.initializers.ones),
                    ("bias", (C,), nn.initializers.zeros)),
            name="layer_norm",
        )()
        (w1, b1) = _ParamHolder(
            leaves=(("kernel", (C, self.hidden_size), linear_init(self.linear_init_mode)),
                    ("bias", (self.hidden_size,), nn.initializers.zeros)),
            name="ffn_1",
        )()
        (w2, b2) = _ParamHolder(
            leaves=(("kernel", (self.hidden_size, C), linear_init(self.ffn2_linear_init_mode)),
                    ("bias", (C,), nn.initializers.zeros)),
            name="ffn_2",
        )()
        if dropout_active:
            seed = jax.random.key_data(self.make_rng("dropout"))
            out = pallas_ffn.fused_ffn_dropout_diff(
                data.reshape(tokens, C), seed, ln_scale, ln_bias, w1, b1,
                w2, b2, self.layer_norm_eps, self.activation,
                self.activation_dropout, self.dropout,
            )
            return out.reshape(data.shape)
        # nondiff args (eps .. full_bwd) positional: custom_vjp requirement.
        # full_bwd on the TRAIN path (not deterministic => a trainer is
        # differentiating the params): one Pallas kernel computes dx AND all
        # parameter grads, replacing the XLA recompute that made the kernels
        # a net loss in dropout-0 training (probe40c).  Inference/guidance
        # (deterministic) keeps the dx-only backward, where the param-grad
        # subgraph is DCE'd.
        out = pallas_ffn.fused_ffn_diff(
            data.reshape(tokens, C), ln_scale, ln_bias, w1, b1, w2, b2,
            self.layer_norm_eps, self.activation, "bfloat16",
            jax.default_backend() != "tpu", not deterministic,
        )
        return out.reshape(data.shape)

    @nn.compact
    def __call__(self, data: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        fused = self._try_fused(data, deterministic)
        if fused is not None:
            return fused
        act = get_activation(self.activation)
        residual = data
        norm = nn.LayerNorm(epsilon=self.layer_norm_eps, name="layer_norm")
        if self.pre_norm:
            data = norm(data)
        ffn_1 = nn.Dense(self.hidden_size, name="ffn_1",
                         kernel_init=linear_init(self.linear_init_mode))
        if self.gated_proj:
            gate = nn.Dense(self.hidden_size, name="ffn_1_gate",
                            kernel_init=linear_init(self.linear_init_mode))
            out = act(gate(data)) * ffn_1(data)
        else:
            out = act(ffn_1(data))
        out = nn.Dropout(self.activation_dropout)(out, deterministic=deterministic)
        out = nn.Dense(self.units, name="ffn_2",
                       kernel_init=linear_init(self.ffn2_linear_init_mode))(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = out + residual
        if not self.pre_norm:
            out = norm(out)
        return out


class PatchMerging3D(nn.Module):
    """3-D patch merge: fold a (dT,dH,dW) neighborhood into channels, then
    LayerNorm + Linear to ``out_dim``.  This is the UNet downsample."""

    out_dim: int
    downsample: Tuple[int, int, int] = (1, 2, 2)
    padding_type: str = "nearest"
    linear_init_mode: str = "0"

    @staticmethod
    def get_out_shape(data_shape, downsample, out_dim):
        T, H, W, _ = data_shape
        pad_t = (downsample[0] - T % downsample[0]) % downsample[0]
        pad_h = (downsample[1] - H % downsample[1]) % downsample[1]
        pad_w = (downsample[2] - W % downsample[2]) % downsample[2]
        return (
            (T + pad_t) // downsample[0],
            (H + pad_h) // downsample[1],
            (W + pad_w) // downsample[2],
            out_dim,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.pad import generalize_padding

        B, T, H, W, C = x.shape
        dT, dH, dW = self.downsample
        pad_t = (dT - T % dT) % dT
        pad_h = (dH - H % dH) % dH
        pad_w = (dW - W % dW) % dW
        if pad_t or pad_h or pad_w:
            x = generalize_padding(x, pad_t, pad_h, pad_w, padding_type=self.padding_type)
            T, H, W = T + pad_t, H + pad_h, W + pad_w
        x = x.reshape(B, T // dT, dT, H // dH, dH, W // dW, dW, C)
        x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
        x = x.reshape(B, T // dT, H // dH, W // dW, dT * dH * dW * C)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = nn.Dense(self.out_dim, use_bias=False, name="reduction",
                     kernel_init=linear_init(self.linear_init_mode))(x)
        return x


class Upsample3DLayer(nn.Module):
    """Nearest-neighbor 2-D upsample to ``target_size`` + 3x3 conv, per frame."""

    out_dim: int
    target_size: Tuple[int, int, int]  # (T, H, W)
    kernel_size: int = 3
    temporal_upsample: bool = False
    conv_init_mode: str = "0"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, H, W, C = x.shape
        if self.temporal_upsample:
            # 3-D nearest resize over T, H, W
            t_idx = (np.arange(self.target_size[0]) * T) // self.target_size[0]
            x = x[:, t_idx]
            x = nearest_resize_2d(x, self.target_size[1], self.target_size[2])
        else:
            assert self.target_size[0] == T
            x = nearest_resize_2d(x, self.target_size[1], self.target_size[2])
        k = self.kernel_size
        x = nn.Conv(
            self.out_dim, kernel_size=(k, k), padding=k // 2, name="conv",
            kernel_init=conv_init(self.conv_init_mode),
        )(x.reshape(B * self.target_size[0], self.target_size[1], self.target_size[2], C))
        return x.reshape((B,) + tuple(self.target_size) + (self.out_dim,))


class TimeEmbedLayer(nn.Module):
    """2-layer SiLU MLP over the sinusoidal timestep embedding."""

    time_embed_channels: int
    linear_init_mode: str = "0"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_channels, name="layer_0",
                     kernel_init=linear_init(self.linear_init_mode))(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.time_embed_channels, name="layer_2",
                     kernel_init=linear_init(self.linear_init_mode))(x)
        return x


# Default lowering for 3x3x3 convs (the UNet's FLOPs hot spot).  "t2d"
# decomposes the temporal axis into 3 accumulated 2-D convs with T folded
# into batch; on v5e at B=1 XLA's native 3-D conv picks a transposed
# T(1,128) output layout at the 8x8x512 stage and runs ~3.7x slower than
# its own 2-D conv path (probe15/probe18-19).  Both paths are numerically
# the same conv; set to "xla" to use lax's native 3-D lowering.
DEFAULT_CONV3D_IMPL = "t2d"

# Trace-scoped override: the best lowering is CONTEXT-dependent (probe46/48:
# at the B=8 TRAIN shapes XLA's native 3-D conv beats t2d on fwd+dx+dw,
# while at B=1 sampling shapes t2d wins) but the same module instances serve
# both the trainer and the sampler.  ``conv3d_impl(...)`` wraps a trace so
# every Conv3x3x3 reached under it lowers with the given impl; resolution
# happens at trace time (like ops/dispatch.py 'auto' flags), so each jitted
# program independently picks its lowering.
_CONV3D_IMPL_OVERRIDE = contextvars.ContextVar("conv3d_impl", default=None)


@contextlib.contextmanager
def conv3d_impl(impl: Optional[str]):
    """Override every ``Conv3x3x3`` lowering inside this (tracing) scope."""
    token = _CONV3D_IMPL_OVERRIDE.set(impl)
    try:
        yield
    finally:
        _CONV3D_IMPL_OVERRIDE.reset(token)


class Conv3x3x3(nn.Module):
    """3x3x3 stride-1 SAME 3-D convolution with a selectable lowering.

    Parameter tree ("kernel" (3,3,3,C,OC), "bias" (OC,)) is identical to
    ``nn.Conv(features, kernel_size=(3,3,3), padding=1)`` so checkpoint
    conversion and module naming are unaffected.
    """

    features: int
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros
    impl: Optional[str] = None
    # fused Pallas kernel on eligible TPU shapes (ops/pallas_conv3d.py —
    # the B=1 sampling shapes starve the MXU under both XLA lowerings);
    # an explicit impl / trace-context override takes precedence.
    use_pallas: Union[bool, str] = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops import pallas_conv3d
        from ..ops.dispatch import resolve_auto

        B, T, H, W, C = x.shape
        kernel = self.param("kernel", self.kernel_init, (3, 3, 3, C, self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        # same dtype promotion as flax nn.Conv
        dtype = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        bias = bias.astype(dtype)
        impl = self.impl or _CONV3D_IMPL_OVERRIDE.get()
        if impl is None:
            if (resolve_auto(self.use_pallas)
                    and pallas_conv3d.supports_shape(T, H, W, C, self.features, B)):
                impl = "pallas"
            else:
                impl = DEFAULT_CONV3D_IMPL
        if impl == "pallas":
            if not pallas_conv3d.supports_shape(T, H, W, C, self.features, B):
                impl = DEFAULT_CONV3D_IMPL  # context override on ineligible shape
        if impl == "pallas":
            return pallas_conv3d.fused_conv3x3x3_diff(
                x, kernel, bias, "bfloat16", jax.default_backend() != "tpu"
            )
        if impl == "xla":
            out = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1, 1),
                padding=((1, 1), (1, 1), (1, 1)),
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, kernel.shape, ("NTHWC", "THWIO", "NTHWC")
                ),
            )
        elif impl == "t2d":
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
            out = None
            for dt in range(3):
                xt = xp[:, dt:dt + T].reshape(B * T, H, W, C)
                o = jax.lax.conv_general_dilated(
                    xt, kernel[dt], window_strides=(1, 1),
                    padding=((1, 1), (1, 1)),
                    dimension_numbers=jax.lax.conv_dimension_numbers(
                        xt.shape, kernel[dt].shape, ("NHWC", "HWIO", "NHWC")
                    ),
                )
                out = o if out is None else out + o
            out = out.reshape(B, T, H, W, self.features)
        else:
            raise ValueError(f"unknown conv3d impl '{impl}'")
        return out + bias


class TimeEmbedResBlock(nn.Module):
    """FiLM-style residual block injecting the diffusion timestep embedding.

    Input layout (B, T, H, W, C) (the torch reference uses NCTHW); 3-D convs
    with kernel 3.  When ``use_embed=False`` it degrades to a plain ResBlock
    (used as ``first_proj``).  ``up``/``down`` insert a parameter-free
    nearest-x2 upsample / (1,2,2) average-pool on the inner two axes between
    the first GN+SiLU and its conv, applied to both the hidden path and the
    skip (reference time_embed.py:97-105 + openaimodel.py:34-106, dims=3
    semantics; no shipped PreDiff config uses them — capability parity).
    """

    channels: int
    dropout: float = 0.0
    emb_channels: Optional[int] = None
    out_channels: Optional[int] = None
    use_conv: bool = False
    use_embed: bool = True
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    norm_groups: int = 32
    use_pallas: Union[bool, str] = False
    use_pallas_conv: Union[bool, str] = False
    # whole-resblock fused kernel (ops/pallas_resblock.py): ONE Pallas call
    # forward + ONE backward for the entire GN->SiLU->conv->GN(+emb)->SiLU->
    # conv->skip body.  Op-count lever for the knowledge-alignment guidance
    # path; eligible shapes only (identity skip, C%128==0, inactive dropout,
    # VMEM budget) — the UNet's resblocks exceed the budget and keep t2d.
    use_pallas_resblock: Union[bool, str] = False

    def _gn_silu(self, x: jnp.ndarray, name: str, groups: int,
                 emb2d: Optional[jnp.ndarray], deterministic: bool) -> jnp.ndarray:
        """silu(GroupNorm(x + emb)) — fused Pallas pair on eligible TPU
        shapes (differentiable via custom_vjp since round-3, so it serves the
        train path and guidance too), else the standard module path.
        Identical param tree either way."""
        from ..ops import pallas_groupnorm
        from ..ops.dispatch import resolve_auto

        B, T, H, W, C = x.shape
        N = T * H * W
        if (
            resolve_auto(self.use_pallas)
            and pallas_groupnorm.supports_shape(N, C, groups)
        ):
            (scale, bias) = _ParamHolder(
                leaves=(("scale", (C,), nn.initializers.ones),
                        ("bias", (C,), nn.initializers.zeros)),
                name=name,
            )()
            out = pallas_groupnorm.fused_groupnorm_silu_diff(
                x.reshape(B, N, C), scale, bias, emb2d, groups,
                1e-5, True, jax.default_backend() != "tpu",
                not deterministic,  # train path: one-kernel all-grads bwd
            )
            return out.reshape(x.shape)
        h = x if emb2d is None else x + emb2d[:, None, None, None, :]
        h = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)(h)
        return jax.nn.silu(h)

    def _fused_resblock(self, x, emb, deterministic, out_channels, groups):
        """Whole-block fused Pallas path (or None).  Exact param tree of the
        standard path; dropout must be inactive (the kernel computes the
        deterministic function)."""
        from ..ops import pallas_resblock
        from ..ops.dispatch import resolve_auto

        B, T, H, W, C = x.shape
        if not (
            resolve_auto(self.use_pallas_resblock)
            and not self.use_scale_shift_norm
            and out_channels == self.channels
            and (deterministic or self.dropout == 0.0)
            and pallas_resblock.supports_shape(T, H, W, C, out_channels,
                                               groups, B=B)
        ):
            return None
        if self.use_embed:
            assert emb is not None and self.emb_channels is not None
            emb_out = nn.Dense(
                out_channels, name="emb_layers_1", kernel_init=linear_init("0")
            )(jax.nn.silu(emb))
        else:
            emb_out = jnp.zeros((B, out_channels), x.dtype)
        (g1s, g1b) = _ParamHolder(
            leaves=(("scale", (C,), nn.initializers.ones),
                    ("bias", (C,), nn.initializers.zeros)),
            name="in_layers_0")()
        (k1, b1) = _ParamHolder(
            leaves=(("kernel", (3, 3, 3, C, out_channels), conv_init("0")),
                    ("bias", (out_channels,), nn.initializers.zeros)),
            name="in_layers_2")()
        (g2s, g2b) = _ParamHolder(
            leaves=(("scale", (out_channels,), nn.initializers.ones),
                    ("bias", (out_channels,), nn.initializers.zeros)),
            name="out_layers_0")()
        (k2, b2) = _ParamHolder(
            leaves=(("kernel", (3, 3, 3, out_channels, out_channels),
                     nn.initializers.zeros),
                    ("bias", (out_channels,), nn.initializers.zeros)),
            name="out_layers_3")()
        return pallas_resblock.fused_resblock_diff(
            x, emb_out, k1, b1, k2, b2, g1s, g1b, g2s, g2b,
            groups, 1e-5, "bfloat16", jax.default_backend() != "tpu")

    @staticmethod
    def _resample_hw(x: jnp.ndarray, up: bool) -> jnp.ndarray:
        """Parameter-free 2x resample of the inner two axes of (B,T,H,W,C):
        nearest-neighbor upsample (ref openaimodel.py:53-57, dims=3) or
        (1,2,2) average pool (ref :92-100)."""
        if up:
            return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return nn.avg_pool(x, (1, 2, 2), strides=(1, 2, 2))

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        emb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        assert not (self.up and self.down)
        out_channels = self.out_channels or self.channels
        in_groups = self.norm_groups if self.channels % self.norm_groups == 0 else self.channels
        out_groups = self.norm_groups if out_channels % self.norm_groups == 0 else out_channels

        if not (self.up or self.down):
            fused = self._fused_resblock(x, emb, deterministic, out_channels,
                                         in_groups)
            if fused is not None:
                return fused

        h = self._gn_silu(x, "in_layers_0", in_groups, None, deterministic)
        if self.up or self.down:
            h = self._resample_hw(h, self.up)
            x = self._resample_hw(x, self.up)
        h = Conv3x3x3(out_channels, name="in_layers_2",
                      kernel_init=conv_init("0"),
                      use_pallas=self.use_pallas_conv)(h)

        out_conv = Conv3x3x3(out_channels, name="out_layers_3",
                             kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros,
                             use_pallas=self.use_pallas_conv)
        drop = nn.Dropout(self.dropout)

        if self.use_embed:
            assert emb is not None and self.emb_channels is not None
            emb_out = nn.Dense(
                2 * out_channels if self.use_scale_shift_norm else out_channels,
                name="emb_layers_1", kernel_init=linear_init("0"),
            )(jax.nn.silu(emb))
            if self.use_scale_shift_norm:
                emb_out = emb_out[:, None, None, None, :]  # broadcast T,H,W
                scale, shift = jnp.split(emb_out, 2, axis=-1)
                out_norm = nn.GroupNorm(num_groups=out_groups, epsilon=1e-5,
                                        name="out_layers_0")
                h = out_norm(h) * (1 + scale) + shift
                h = jax.nn.silu(h)
                h = drop(h, deterministic=deterministic)
                h = out_conv(h)
            else:
                h = self._gn_silu(h, "out_layers_0", out_groups, emb_out,
                                  deterministic)
                h = drop(h, deterministic=deterministic)
                h = out_conv(h)
        else:
            h = self._gn_silu(h, "out_layers_0", out_groups, None, deterministic)
            h = drop(h, deterministic=deterministic)
            h = out_conv(h)

        if out_channels == self.channels:
            skip = x
        elif self.use_conv:
            skip = Conv3x3x3(out_channels, name="skip_connection",
                             kernel_init=conv_init("0"),
                             use_pallas=self.use_pallas_conv)(x)
        else:
            skip = nn.Conv(out_channels, kernel_size=(1, 1, 1), name="skip_connection",
                           kernel_init=conv_init("0"))(x)
        return skip + h
