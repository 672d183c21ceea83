"""Earthformer cuboid-transformer UNet — the latent diffusion denoiser.

Reference parity: CuboidTransformerUNet
(src/prediff/models/cuboid_transformer/cuboid_transformer_unet.py:11,
forward :406).  Input: noisy latent x (B,T_out,H,W,C) + conditioning latent
(B,T_in,H,W,C), concatenated along T with a 0/1 observation-indicator channel
(:425-428); output: denoised prediction over the last T_out frames (:492).

Layout is NTHWC end to end (TPU channel-last); the torch reference permutes
to NCTHW around its ResBlocks — our TimeEmbedResBlock is natively channel-last.
"""
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .init import linear_init, trunc_normal
from .layers import (
    PosEmbed,
    PatchMerging3D,
    Upsample3DLayer,
    TimeEmbedLayer,
    TimeEmbedResBlock,
    timestep_embedding,
)
from .cuboid_attention import StackCuboidSelfAttentionBlock
from .patterns import CuboidSelfAttentionPatterns


def round_to(dat: int, c: int) -> int:
    return dat + (dat - dat % c) % c


def _normalize_downsample(downsample) -> Tuple[int, int, int]:
    if not isinstance(downsample, (tuple, list)):
        return (1, downsample, downsample)
    return tuple(downsample)


def compute_block_units(base_units, num_blocks, downsample, scale_alpha):
    downsample = _normalize_downsample(downsample)
    return [
        round_to(base_units * int((max(downsample) ** scale_alpha) ** i), 4)
        for i in range(num_blocks)
    ]


def compute_mem_shapes(data_shape, base_units, num_blocks, downsample, block_units):
    """Per-stage (T, H, W, C) feature shapes after each patch-merge."""
    downsample = _normalize_downsample(downsample)
    inner = tuple(data_shape[:3]) + (base_units,)
    mem_shapes = [inner]
    curr = inner
    for i in range(num_blocks - 1):
        curr = PatchMerging3D.get_out_shape(curr, downsample, block_units[i + 1])
        mem_shapes.append(curr)
    return mem_shapes


def resolve_block_patterns(block_attn_patterns, mem_shapes, num_blocks,
                           block_cuboid_size, block_cuboid_strategy,
                           block_cuboid_shift_size):
    """Resolve either named patterns or explicit per-block cuboid specs."""
    if block_attn_patterns is not None:
        if isinstance(block_attn_patterns, str):
            block_attn_patterns = [block_attn_patterns] * num_blocks
        assert len(block_attn_patterns) == num_blocks
        sizes, strategies, shifts = [], [], []
        for idx, key in enumerate(block_attn_patterns):
            func = CuboidSelfAttentionPatterns.get(key)
            cuboid_size, strategy, shift_size = func(mem_shapes[idx])
            sizes.append(cuboid_size)
            strategies.append(strategy)
            shifts.append(shift_size)
        return sizes, strategies, shifts
    if not isinstance(block_cuboid_size[0][0], (list, tuple)):
        block_cuboid_size = [block_cuboid_size] * num_blocks
    if not isinstance(block_cuboid_strategy[0][0], (list, tuple)):
        block_cuboid_strategy = [block_cuboid_strategy] * num_blocks
    if not isinstance(block_cuboid_shift_size[0][0], (list, tuple)):
        block_cuboid_shift_size = [block_cuboid_shift_size] * num_blocks
    assert len(block_cuboid_size) == num_blocks
    return block_cuboid_size, block_cuboid_strategy, block_cuboid_shift_size


class CuboidTransformerUNet(nn.Module):
    """U-Net of [TimeEmbedResBlock -> StackCuboidSelfAttentionBlock] stages
    with PatchMerging3D downsamples / Upsample3DLayer upsamples and UNet
    residual connections."""

    input_shape: Tuple[int, int, int, int]   # (T_in, H, W, C)
    target_shape: Tuple[int, int, int, int]  # (T_out, H, W, C)
    base_units: int = 128
    block_units: Optional[Sequence[int]] = None
    scale_alpha: float = 1.0
    depth: Sequence[int] = (4, 4, 4)
    downsample: Union[int, Tuple[int, int, int]] = 2
    downsample_type: str = "patch_merge"
    upsample_type: str = "upsample"
    upsample_kernel_size: int = 3
    block_attn_patterns: Optional[Union[str, Sequence[str]]] = None
    block_cuboid_size: Sequence = ((4, 4, 4), (4, 4, 4))
    block_cuboid_strategy: Sequence = (("l", "l", "l"), ("d", "d", "d"))
    block_cuboid_shift_size: Sequence = ((0, 0, 0), (0, 0, 0))
    num_heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    ffn_drop: float = 0.0
    ffn_activation: str = "leaky"
    gated_ffn: bool = False
    norm_layer: str = "layer_norm"
    use_inter_ffn: bool = True
    hierarchical_pos_embed: bool = False
    pos_embed_type: str = "t+h+w"
    padding_type: str = "ignore"
    checkpoint_level: int = 0
    use_relative_pos: bool = True
    use_pallas_attention: Union[bool, str] = False
    use_pallas_ffn: Union[bool, str] = False
    use_pallas_dropout: Union[bool, str] = "auto"
    use_pallas_gn: Union[bool, str] = False
    use_pallas_conv: Union[bool, str] = False
    use_pallas_resblock: Union[bool, str] = False
    self_attn_use_final_proj: bool = True
    num_global_vectors: int = 0
    use_global_vector_ffn: bool = True
    use_global_self_attn: bool = False
    separate_global_qkv: bool = False
    global_dim_ratio: int = 1
    attn_linear_init_mode: str = "0"
    ffn_linear_init_mode: str = "0"
    ffn2_linear_init_mode: str = "2"
    attn_proj_linear_init_mode: str = "2"
    conv_init_mode: str = "0"
    down_linear_init_mode: str = "0"
    up_linear_init_mode: str = "0"
    global_proj_linear_init_mode: str = "2"
    norm_init_mode: str = "0"
    time_embed_channels_mult: int = 4
    time_embed_use_scale_shift_norm: bool = False
    time_embed_dropout: float = 0.0
    unet_res_connect: bool = True

    @property
    def data_shape(self) -> Tuple[int, int, int, int]:
        T_in, H_in, W_in, C_in = self.input_shape
        T_out, H_out, W_out, C_out = self.target_shape
        assert H_in == H_out and W_in == W_out and C_in == C_out
        return (T_in + T_out, H_in, W_in, C_in + 1)  # +1 obs indicator channel

    @property
    def num_blocks(self) -> int:
        return len(self.depth)

    @property
    def resolved_block_units(self):
        if self.block_units is not None:
            assert len(self.block_units) == self.num_blocks
            assert self.block_units[0] == self.base_units
            return list(self.block_units)
        return compute_block_units(
            self.base_units, self.num_blocks, self.downsample, self.scale_alpha
        )

    @property
    def mem_shapes(self):
        return compute_mem_shapes(
            self.data_shape, self.base_units, self.num_blocks,
            self.downsample, self.resolved_block_units,
        )

    @nn.compact
    def __call__(self, x, t, cond, deterministic: bool = True):
        """x: (B, T_out, H, W, C) noisy latent; t: (B,); cond: (B, T_in, H, W, C)."""
        assert self.downsample_type == "patch_merge"
        assert self.upsample_type == "upsample"
        block_units = self.resolved_block_units
        mem_shapes = self.mem_shapes
        downsample = _normalize_downsample(self.downsample)
        block_cuboid_size, block_strategy, block_shift_size = resolve_block_patterns(
            self.block_attn_patterns, mem_shapes, self.num_blocks,
            self.block_cuboid_size, self.block_cuboid_strategy,
            self.block_cuboid_shift_size,
        )
        T_in = self.input_shape[0]
        batch_size = x.shape[0]
        use_global = self.num_global_vectors > 0

        x = jnp.concatenate([cond, x], axis=1)
        obs_indicator = jnp.concatenate(
            [
                jnp.ones(x[:, :T_in, ..., :1].shape, x.dtype),
                jnp.zeros(x[:, T_in:, ..., :1].shape, x.dtype),
            ],
            axis=1,
        )
        x = jnp.concatenate([x, obs_indicator], axis=-1)
        x = TimeEmbedResBlock(
            channels=self.data_shape[-1],
            dropout=self.proj_drop,
            out_channels=self.base_units,
            use_conv=False,
            use_embed=False,
            use_pallas=self.use_pallas_gn,
            use_pallas_conv=self.use_pallas_conv,
            use_pallas_resblock=self.use_pallas_resblock,
            name="first_proj",
        )(x, deterministic=deterministic)

        if use_global:
            init_gv = self.param(
                "init_global_vectors",
                trunc_normal(0.02),
                (self.num_global_vectors, self.global_dim_ratio * self.base_units),
            )
            global_vectors = jnp.broadcast_to(
                init_gv[None],
                (batch_size, self.num_global_vectors, self.global_dim_ratio * self.base_units),
            )
        else:
            global_vectors = None

        x = PosEmbed(
            embed_dim=self.base_units, typ=self.pos_embed_type,
            maxT=self.data_shape[0], maxH=self.data_shape[1], maxW=self.data_shape[2],
            name="pos_embed",
        )(x)

        t_emb = TimeEmbedLayer(
            time_embed_channels=block_units[0] * self.time_embed_channels_mult,
            name="time_embed",
        )(timestep_embedding(t, block_units[0]).astype(x.dtype))

        def make_stack_block(i, prefix, j):
            return StackCuboidSelfAttentionBlock(
                dim=mem_shapes[i][-1],
                num_heads=self.num_heads,
                block_cuboid_size=block_cuboid_size[i],
                block_strategy=block_strategy[i],
                block_shift_size=block_shift_size[i],
                attn_drop=self.attn_drop,
                proj_drop=self.proj_drop,
                ffn_drop=self.ffn_drop,
                activation=self.ffn_activation,
                gated_ffn=self.gated_ffn,
                use_inter_ffn=self.use_inter_ffn,
                padding_type=self.padding_type,
                use_global_vector=use_global,
                use_global_vector_ffn=self.use_global_vector_ffn,
                use_global_self_attn=self.use_global_self_attn,
                separate_global_qkv=self.separate_global_qkv,
                global_dim_ratio=self.global_dim_ratio,
                checkpoint_level=self.checkpoint_level,
                use_relative_pos=self.use_relative_pos,
                use_pallas_attention=self.use_pallas_attention,
                use_pallas_dropout=self.use_pallas_dropout,
                use_pallas_ffn=self.use_pallas_ffn,
                use_final_proj=self.self_attn_use_final_proj,
                attn_linear_init_mode=self.attn_linear_init_mode,
                ffn_linear_init_mode=self.ffn_linear_init_mode,
                ffn2_linear_init_mode=self.ffn2_linear_init_mode,
                attn_proj_linear_init_mode=self.attn_proj_linear_init_mode,
                name=f"{prefix}_{i}_{j}",
            )

        def make_time_block(i, prefix):
            return TimeEmbedResBlock(
                channels=mem_shapes[i][-1],
                emb_channels=block_units[0] * self.time_embed_channels_mult,
                dropout=self.time_embed_dropout,
                out_channels=mem_shapes[i][-1],
                use_conv=False,
                use_embed=True,
                use_scale_shift_norm=self.time_embed_use_scale_shift_norm,
                use_pallas=self.use_pallas_gn,
                use_pallas_conv=self.use_pallas_conv,
                use_pallas_resblock=self.use_pallas_resblock,
                name=f"{prefix}_{i}",
            )

        # ---- down path ----
        res_connect_l = []
        for i in range(self.num_blocks):
            if i > 0:
                x = PatchMerging3D(
                    out_dim=block_units[i],
                    downsample=downsample,
                    padding_type=self.padding_type,
                    linear_init_mode=self.down_linear_init_mode,
                    name=f"downsample_layers_{i - 1}",
                )(x)
                if self.hierarchical_pos_embed:
                    x = PosEmbed(
                        embed_dim=block_units[i], typ=self.pos_embed_type,
                        maxT=mem_shapes[i][0], maxH=mem_shapes[i][1], maxW=mem_shapes[i][2],
                        name=f"down_hierarchical_pos_embed_l_{i - 1}",
                    )(x)
                if use_global:
                    global_vectors = nn.Dense(
                        self.global_dim_ratio * block_units[i],
                        name=f"down_layer_global_proj_{i - 1}",
                        kernel_init=linear_init(self.global_proj_linear_init_mode),
                    )(global_vectors)
            time_block = make_time_block(i, "down_time_embed_blocks")
            for j in range(self.depth[i]):
                x = time_block(x, t_emb, deterministic=deterministic)
                block = make_stack_block(i, "down_self_blocks", j)
                if use_global:
                    x, global_vectors = block(x, global_vectors, deterministic=deterministic)
                else:
                    x = block(x, deterministic=deterministic)
            if self.unet_res_connect and i < self.num_blocks - 1:
                res_connect_l.append(x)

        # ---- up path ----
        for i in range(self.num_blocks - 1, -1, -1):
            if self.unet_res_connect and i < self.num_blocks - 1:
                x = x + res_connect_l[i]
            time_block = make_time_block(i, "up_time_embed_blocks")
            for j in range(self.depth[i]):
                x = time_block(x, t_emb, deterministic=deterministic)
                block = make_stack_block(i, "up_self_blocks", j)
                if use_global:
                    x, global_vectors = block(x, global_vectors, deterministic=deterministic)
                else:
                    x = block(x, deterministic=deterministic)
            if i > 0:
                x = Upsample3DLayer(
                    out_dim=mem_shapes[i - 1][-1],
                    target_size=tuple(mem_shapes[i - 1][:3]),
                    kernel_size=self.upsample_kernel_size,
                    temporal_upsample=False,
                    conv_init_mode=self.conv_init_mode,
                    name=f"upsample_layers_{i - 1}",
                )(x)
                if self.hierarchical_pos_embed:
                    x = PosEmbed(
                        embed_dim=block_units[i - 1], typ=self.pos_embed_type,
                        maxT=mem_shapes[i - 1][0], maxH=mem_shapes[i - 1][1],
                        maxW=mem_shapes[i - 1][2],
                        name=f"up_hierarchical_pos_embed_l_{i - 1}",
                    )(x)
                if use_global:
                    global_vectors = nn.Dense(
                        self.global_dim_ratio * block_units[i - 1],
                        name=f"up_layer_global_proj_{i - 1}",
                        kernel_init=linear_init(self.global_proj_linear_init_mode),
                    )(global_vectors)

        x = nn.Dense(
            self.target_shape[-1], name="final_proj", kernel_init=linear_init("2"),
        )(x[:, T_in:, ...])
        return x
