"""Knowledge-alignment network U(z_t, t, ...) — a half-UNet cuboid encoder
with a CLIP-style attention-pool readout.

Reference parity: NoisyCuboidTransformerEncoder
(src/prediff/diffusion/knowledge_alignment/models.py:107, forward :459),
AttentionPool3d (:49), QKVAttention (:19).
"""
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .init import linear_init, trunc_normal
from .layers import (
    PosEmbed,
    PatchMerging3D,
    TimeEmbedLayer,
    TimeEmbedResBlock,
    timestep_embedding,
)
from .cuboid_attention import StackCuboidSelfAttentionBlock
from .unet import (
    compute_block_units,
    compute_mem_shapes,
    resolve_block_patterns,
    _normalize_downsample,
)


class AttentionPool3d(nn.Module):
    """Mean token + learned positional embedding + single QKV attention,
    reading out token 0 (ref models.py:49-104).  Input (N, L, C) channel-last
    (torch uses (N, C, L)); the 1x conv projections keep Conv1d-compatible
    kernels for checkpoint conversion."""

    data_dim: int  # number of tokens L (excluding the mean token)
    embed_dim: int
    num_heads: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        N, L, C = x.shape
        assert C == self.embed_dim
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)  # (N, L+1, C)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=self.embed_dim**-0.5),
            (self.embed_dim, self.data_dim + 1),
        )
        x = x + pos.T[None]
        qkv = nn.Conv(3 * self.embed_dim, kernel_size=(1,), name="qkv_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        heads = self.num_heads
        ch = self.embed_dim // heads
        scale = 1.0 / np.sqrt(np.sqrt(ch))
        q = q.reshape(N, L + 1, heads, ch) * scale
        k = k.reshape(N, L + 1, heads, ch) * scale
        v = v.reshape(N, L + 1, heads, ch)
        w = jnp.einsum("bihc,bjhc->bhij", q, k)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(w.dtype)
        a = jnp.einsum("bhij,bjhc->bihc", w, v).reshape(N, L + 1, self.embed_dim)
        a = nn.Conv(self.output_dim or self.embed_dim, kernel_size=(1,), name="c_proj")(a)
        return a[:, 0]


class NoisyCuboidTransformerEncoder(nn.Module):
    """Encoder-only cuboid transformer over noisy latents, with attention-pool
    readout to (B, T, out_channels) (readout_seq) or (B, out_channels)."""

    input_shape: Tuple[int, int, int, int]  # (T, H, W, C)
    out_channels: int = 1
    base_units: int = 128
    block_units: Optional[Sequence[int]] = None
    scale_alpha: float = 1.0
    depth: Sequence[int] = (4, 4, 4)
    downsample: Union[int, Tuple[int, int, int]] = 2
    downsample_type: str = "patch_merge"
    block_attn_patterns: Optional[Union[str, Sequence[str]]] = None
    block_cuboid_size: Sequence = ((4, 4, 4), (4, 4, 4))
    block_cuboid_strategy: Sequence = (("l", "l", "l"), ("d", "d", "d"))
    block_cuboid_shift_size: Sequence = ((0, 0, 0), (0, 0, 0))
    num_heads: int = 4
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    ffn_drop: float = 0.0
    ffn_activation: str = "gelu"
    gated_ffn: bool = False
    norm_layer: str = "layer_norm"
    use_inter_ffn: bool = True
    hierarchical_pos_embed: bool = False
    pos_embed_type: str = "t+h+w"
    padding_type: str = "zeros"
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
    global_proj_linear_init_mode: str = "2"
    norm_init_mode: str = "0"
    time_embed_channels_mult: int = 4
    time_embed_use_scale_shift_norm: bool = False
    time_embed_dropout: float = 0.0
    pool: str = "attention"
    readout_seq: bool = True
    out_len: Optional[int] = None

    @property
    def num_blocks(self) -> int:
        return len(self.depth)

    @property
    def resolved_block_units(self):
        if self.block_units is not None:
            return list(self.block_units)
        return compute_block_units(
            self.base_units, self.num_blocks, self.downsample, self.scale_alpha
        )

    @property
    def mem_shapes(self):
        return compute_mem_shapes(
            tuple(self.input_shape), self.base_units, self.num_blocks,
            self.downsample, self.resolved_block_units,
        )

    @nn.compact
    def __call__(self, x, t, deterministic: bool = True, **kwargs):
        """x: (B, T, H, W, C) noisy latent; t: (B,).  Extra conditioning
        kwargs (zc, y, ...) are accepted for API parity and ignored by this
        architecture (the reference does the same: models.py:459)."""
        assert self.downsample_type == "patch_merge"
        assert self.pool == "attention", f"pool '{self.pool}' not supported"
        block_units = self.resolved_block_units
        mem_shapes = self.mem_shapes
        downsample = _normalize_downsample(self.downsample)
        block_cuboid_size, block_strategy, block_shift_size = resolve_block_patterns(
            self.block_attn_patterns, mem_shapes, self.num_blocks,
            self.block_cuboid_size, self.block_cuboid_strategy,
            self.block_cuboid_shift_size,
        )
        batch_size, seq_len = x.shape[0], x.shape[1]
        use_global = self.num_global_vectors > 0

        x = TimeEmbedResBlock(
            channels=self.input_shape[-1],
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
            maxT=self.input_shape[0], maxH=self.input_shape[1], maxW=self.input_shape[2],
            name="pos_embed",
        )(x)
        t_emb = TimeEmbedLayer(
            time_embed_channels=block_units[0] * self.time_embed_channels_mult,
            name="time_embed",
        )(timestep_embedding(t, block_units[0]).astype(x.dtype))

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
            time_block = TimeEmbedResBlock(
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
                name=f"down_time_embed_blocks_{i}",
            )
            for j in range(self.depth[i]):
                x = time_block(x, t_emb, deterministic=deterministic)
                block = StackCuboidSelfAttentionBlock(
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
                    name=f"down_self_blocks_{i}_{j}",
                )
                if use_global:
                    x, global_vectors = block(x, global_vectors, deterministic=deterministic)
                else:
                    x = block(x, deterministic=deterministic)

        out_shape = mem_shapes[-1]
        cuboid_out_channels = out_shape[-1]
        norm = nn.GroupNorm(
            num_groups=min(cuboid_out_channels, 32), epsilon=1e-5, name="out_0"
        )
        if self.readout_seq:
            T_cur = x.shape[1]
            if self.out_len is not None:
                x = x[:, -self.out_len:]
                T_cur = self.out_len
            tokens = x.reshape(batch_size * T_cur, -1, cuboid_out_channels)
            if use_global:
                gl = jnp.tile(global_vectors, (T_cur, 1, 1))
                tokens = jnp.concatenate([tokens, gl], axis=1)
            tokens = jax.nn.silu(norm(tokens))
            data_dim = int(np.prod(out_shape[1:-1])) + self.num_global_vectors
            out = AttentionPool3d(
                data_dim=data_dim, embed_dim=cuboid_out_channels,
                num_heads=self.num_heads, output_dim=self.out_channels,
                name="out_2",
            )(tokens)
            return out.reshape(batch_size, T_cur, self.out_channels)
        else:
            tokens = x.reshape(batch_size, -1, cuboid_out_channels)
            if use_global:
                tokens = jnp.concatenate([tokens, global_vectors], axis=1)
            tokens = jax.nn.silu(norm(tokens))
            data_dim = int(np.prod(out_shape[:-1])) + self.num_global_vectors
            return AttentionPool3d(
                data_dim=data_dim, embed_dim=cuboid_out_channels,
                num_heads=self.num_heads, output_dim=self.out_channels,
                name="out_2",
            )(tokens)
