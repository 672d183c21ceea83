"""Cuboid self-attention (flax.linen), the Earthformer core.

Reference parity: CuboidSelfAttentionLayer (cuboid_transformer.py:595,
forward :812) and StackCuboidSelfAttentionBlock (:969).

TPU-first notes:
  * relative-position bias indices + shifted-window masks are precomputed in
    numpy at trace time (static shapes) and folded into the graph as
    constants — no device-side cache.
  * the attention itself is expressed as batched einsums over
    (B, num_cuboids, volume, heads, head_dim) so XLA maps it straight onto
    the MXU; a fused Pallas kernel can be swapped in via
    ``prediff_tpu.ops.pallas_attention`` for the hot shapes.
  * all-True masks are elided entirely (plain softmax).
"""
import functools
from typing import Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.cuboid import (
    cuboid_reorder,
    cuboid_reorder_reverse,
    compute_cuboid_self_attention_mask,
    update_cuboid_size_shift_size,
    masked_softmax,
)
from ..ops.pad import generalize_padding, generalize_unpadding
from .init import linear_init, trunc_normal
from .layers import PositionwiseFFN, _ParamHolder


@functools.lru_cache(maxsize=None)
def compute_relative_position_index(cuboid_size: Tuple[int, int, int]) -> np.ndarray:
    """(volume, volume) index into the (2bt-1)(2bh-1)(2bw-1) bias table."""
    coords = np.stack(
        np.meshgrid(
            np.arange(cuboid_size[0]),
            np.arange(cuboid_size[1]),
            np.arange(cuboid_size[2]),
            indexing="ij",
        )
    )  # (3, bt, bh, bw)
    coords_flat = coords.reshape(3, -1)
    rel = coords_flat[:, :, None] - coords_flat[:, None, :]  # (3, vol, vol)
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += cuboid_size[0] - 1
    rel[:, :, 1] += cuboid_size[1] - 1
    rel[:, :, 2] += cuboid_size[2] - 1
    rel[:, :, 0] *= (2 * cuboid_size[1] - 1) * (2 * cuboid_size[2] - 1)
    rel[:, :, 1] *= 2 * cuboid_size[2] - 1
    return rel.sum(-1)


class CuboidSelfAttentionLayer(nn.Module):
    """Self-attention within non-overlapping (local or dilated) cuboids, with
    optional Swin-style shifted windows, learned relative-position bias, and
    K global vectors (l2g / g2l / g2g paths)."""

    dim: int
    num_heads: int
    cuboid_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    strategy: Tuple[str, str, str] = ("l", "l", "l")
    padding_type: str = "ignore"
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_final_proj: bool = True
    use_global_vector: bool = False
    use_global_self_attn: bool = False
    separate_global_qkv: bool = False
    global_dim_ratio: int = 1
    use_relative_pos: bool = True
    # False | True (grouped scores kernel) | "layer" (whole-layer fusion)
    use_pallas_attention: Union[bool, str] = False
    # in-kernel PRNG dropout (round-4): the whole-layer kernel serves
    # ACTIVE attn/proj dropout training (v1 recipe).  'auto' = real TPU
    # only (validated on-chip by probe67; +45% over the XLA v1 path,
    # probe68).
    use_pallas_dropout: Union[bool, str] = "auto"
    attn_linear_init_mode: str = "0"
    ffn_linear_init_mode: str = "2"  # the final-proj init mode (ref naming)

    def _rel_bias(self, cuboid_volume: int):
        """(heads, vol, vol) relative-position bias from the learned table."""
        table = self.param(
            "relative_position_bias_table",
            trunc_normal(0.02),
            (
                (2 * self.cuboid_size[0] - 1)
                * (2 * self.cuboid_size[1] - 1)
                * (2 * self.cuboid_size[2] - 1),
                self.num_heads,
            ),
        )
        rel_idx = compute_relative_position_index(tuple(self.cuboid_size))
        rel_idx = rel_idx[:cuboid_volume, :cuboid_volume]
        # coerce: params loaded from numpy checkpoints would otherwise be
        # fancy-indexed as numpy arrays, which rejects traced indices
        bias = jnp.asarray(table)[jnp.asarray(rel_idx.reshape(-1))]
        bias = bias.reshape(cuboid_volume, cuboid_volume, self.num_heads)
        return bias.transpose(2, 0, 1)

    def _try_fused_layer(self, x, deterministic: bool):
        """Route through the whole-layer Pallas kernel when the configuration
        permits (no globals/mask/pad/shift); returns None to fall back.

        Differentiable (round-3): the ``*_diff`` kernels carry a custom_vjp
        (fused Pallas dx kernel + XLA-recomputed param grads), serving the
        train path and guidance gradients — EXCEPT when this layer's dropout
        is active (rate > 0 and not deterministic), where flax Dropout
        semantics require the XLA path."""
        if self.use_global_vector or self.qkv_bias or not self.use_final_proj:
            return None
        from ..ops.dispatch import resolve_auto

        dropout_active = not deterministic and (
            self.attn_drop > 0.0 or self.proj_drop > 0.0
        )
        if dropout_active and not resolve_auto(self.use_pallas_dropout):
            return None  # keep flax Dropout semantics (XLA path)
        B, T, H, W, C = x.shape
        cuboid_size, shift_size = update_cuboid_size_shift_size(
            (T, H, W), self.cuboid_size, self.shift_size, self.strategy
        )
        dims = (T, H, W)
        pads = [(cuboid_size[i] - dims[i] % cuboid_size[i]) % cuboid_size[i]
                for i in range(3)]
        if any(pads) or any(shift_size):
            return None
        if compute_cuboid_self_attention_mask(
            (T, H, W), cuboid_size, tuple(shift_size), tuple(self.strategy),
            self.padding_type,
        ) is not None:
            return None

        from ..ops.pallas_attention import (
            fused_cuboid_attention_layer_v4_diff,
            fused_axial_attention_5d_diff,
            fused_cuboid_attention_layer_v4_dropout_diff,
            fused_axial_attention_5d_dropout_diff,
            axial_attention_plan,
            pick_cuboid_group,
            supports_attention_dropout,
        )

        vol = cuboid_size[0] * cuboid_size[1] * cuboid_size[2]
        num_cuboids = (T // cuboid_size[0]) * (H // cuboid_size[1]) * (W // cuboid_size[2])
        # axial single-axis cuboid spanning its full axis: the 5-D kernel
        # consumes the natural layout, no reorder transpose
        axial_axis = None
        if self.dim % 128 == 0:
            for ax in range(3):
                if (cuboid_size[ax] == (T, H, W)[ax]
                        and all(cuboid_size[o] == 1 for o in range(3) if o != ax)):
                    if axial_attention_plan(x.shape, ax,
                                            num_heads=self.num_heads) is not None:
                        axial_axis = ax
                    break
        if axial_axis is None and (
            self.dim % 128 != 0
            or pick_cuboid_group(num_cuboids, vol, C=self.dim,
                                 num_heads=self.num_heads) is None
        ):
            return None
        if dropout_active:
            # in-kernel dropout needs a real TPU and the all-grads backward
            if axial_axis is not None:
                plan = axial_attention_plan(x.shape, axial_axis,
                                            num_heads=self.num_heads)
                ok = supports_attention_dropout(
                    plan["R"], plan["vol"], C, self.num_heads)
            else:
                G = pick_cuboid_group(num_cuboids, vol, C=self.dim,
                                      num_heads=self.num_heads)
                ok = supports_attention_dropout(
                    G * vol, vol, C, self.num_heads)
            if not ok:
                return None
        (ln_scale, ln_bias) = _ParamHolder(
            leaves=(("scale", (C,), nn.initializers.ones),
                    ("bias", (C,), nn.initializers.zeros)),
            name="norm",
        )()
        (w_qkv,) = _ParamHolder(
            leaves=(("kernel", (C, 3 * C), linear_init(self.attn_linear_init_mode)),),
            name="qkv",
        )()
        (w_proj, b_proj) = _ParamHolder(
            leaves=(("kernel", (C, C), linear_init(self.ffn_linear_init_mode)),
                    ("bias", (C,), nn.initializers.zeros)),
            name="proj",
        )()
        if self.use_relative_pos:
            bias = self._rel_bias(vol)
        else:
            bias = jnp.zeros((self.num_heads, vol, vol), x.dtype)
        scale = self.qk_scale or (C // self.num_heads) ** -0.5
        interpret = jax.default_backend() != "tpu"
        # full_bwd on the TRAIN path (not deterministic => a trainer is
        # differentiating and parameter grads will be consumed); guidance
        # keeps the dx-only backward whose XLA param-grad recompute is DCE'd
        # (XLA cannot DCE individual pallas outputs — see pallas_ffn).
        full_bwd = not deterministic
        if dropout_active:
            seed = jax.random.key_data(self.make_rng("dropout"))
            if axial_axis is not None:
                return fused_axial_attention_5d_dropout_diff(
                    x, seed, axial_axis, ln_scale, ln_bias, w_qkv, bias,
                    w_proj, b_proj, self.num_heads, scale, 1e-5,
                    self.attn_drop, self.proj_drop,
                )
            reordered = cuboid_reorder(x, cuboid_size=cuboid_size,
                                       strategy=self.strategy)
            out = fused_cuboid_attention_layer_v4_dropout_diff(
                reordered, seed, ln_scale, ln_bias, w_qkv, bias, w_proj,
                b_proj, self.num_heads, scale, 1e-5,
                self.attn_drop, self.proj_drop,
            )
            return cuboid_reorder_reverse(
                out, cuboid_size=cuboid_size, strategy=self.strategy,
                orig_data_shape=(T, H, W),
            )
        # nondiff args (num_heads .. full_bwd) passed positionally:
        # jax.custom_vjp nondiff_argnums are positional-only
        if axial_axis is not None:
            return fused_axial_attention_5d_diff(
                x, axial_axis, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
                self.num_heads, scale, 1e-5, "bfloat16", interpret, full_bwd,
            )
        reordered = cuboid_reorder(x, cuboid_size=cuboid_size, strategy=self.strategy)
        out = fused_cuboid_attention_layer_v4_diff(
            reordered, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
            self.num_heads, scale, 1e-5, "bfloat16", interpret, full_bwd,
        )
        return cuboid_reorder_reverse(
            out, cuboid_size=cuboid_size, strategy=self.strategy,
            orig_data_shape=(T, H, W),
        )

    @nn.compact
    def __call__(self, x, global_vectors=None, deterministic: bool = True):
        from ..ops.dispatch import resolve_auto_attn

        assert self.padding_type in ("ignore", "zeros", "nearest")
        assert self.dim % self.num_heads == 0
        if self.global_dim_ratio != 1:
            assert self.separate_global_qkv, \
                "global_dim_ratio != 1 requires separate_global_qkv=True"
        # 'auto' resolves HERE (trace time), not at build time, so the kernel
        # decision tracks the backend the model actually runs under
        use_pallas_attention = resolve_auto_attn(self.use_pallas_attention)
        head_C = self.dim // self.num_heads
        scale = self.qk_scale or head_C**-0.5
        gC = self.global_dim_ratio * self.dim

        # ---- whole-layer Pallas fusion fast path ------------------------ #
        if use_pallas_attention == "layer":
            fused = self._try_fused_layer(x, deterministic)
            if fused is not None:
                return fused

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        B, T, H, W, C_in = x.shape
        assert C_in == self.dim

        if self.use_global_vector:
            assert global_vectors is not None
            _, num_global, _ = global_vectors.shape
            global_vectors = nn.LayerNorm(epsilon=1e-5, name="global_vec_norm")(global_vectors)

        cuboid_size, shift_size = update_cuboid_size_shift_size(
            (T, H, W), self.cuboid_size, self.shift_size, self.strategy
        )
        pad_t = (cuboid_size[0] - T % cuboid_size[0]) % cuboid_size[0]
        pad_h = (cuboid_size[1] - H % cuboid_size[1]) % cuboid_size[1]
        pad_w = (cuboid_size[2] - W % cuboid_size[2]) % cuboid_size[2]
        x = generalize_padding(x, pad_t, pad_h, pad_w, self.padding_type)

        if any(s > 0 for s in shift_size):
            shifted_x = jnp.roll(
                x, shift=(-shift_size[0], -shift_size[1], -shift_size[2]), axis=(1, 2, 3)
            )
        else:
            shifted_x = x

        reordered_x = cuboid_reorder(shifted_x, cuboid_size=cuboid_size, strategy=self.strategy)
        _, num_cuboids, cuboid_volume, _ = reordered_x.shape

        attn_mask_np = compute_cuboid_self_attention_mask(
            (T, H, W), cuboid_size, shift_size, self.strategy, self.padding_type
        )
        attn_mask = None if attn_mask_np is None else jnp.asarray(attn_mask_np)

        qkv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="qkv",
                       kernel_init=linear_init(self.attn_linear_init_mode))(reordered_x)
        qkv = qkv.reshape(B, num_cuboids, cuboid_volume, 3, self.num_heads, head_C)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        # (B, nC, vol, heads, head_C)

        bias = self._rel_bias(cuboid_volume) if self.use_relative_pos else None

        if (
            # True = grouped-scores kernel; "layer" layers that failed the
            # whole-layer eligibility gate above INTENTIONALLY downgrade to
            # the grouped kernel here rather than all the way to einsum
            use_pallas_attention in (True, "layer")
            and not self.use_global_vector
            # the diff variant's custom_vjp serves training and guidance;
            # active attention dropout (rate>0, train) keeps the einsum path
            # (the kernel skips weight dropout)
            and (deterministic or self.attn_drop == 0.0)
        ):
            # fused Pallas path: groups of cuboids batched per grid cell so the
            # tiny per-cuboid matmuls fill the MXU
            from ..ops.pallas_attention import fused_cuboid_attention_grouped_diff

            qp = q.transpose(0, 3, 1, 2, 4)  # (B, H, nC, vol, hc)
            kp = k.transpose(0, 3, 1, 2, 4)
            vp = v.transpose(0, 3, 1, 2, 4)
            bias_p = (
                bias if bias is not None
                else jnp.zeros((self.num_heads, cuboid_volume, cuboid_volume), q.dtype)
            )
            out = fused_cuboid_attention_grouped_diff(
                qp, kp, vp, bias_p, attn_mask, scale, 8,
                jax.default_backend() != "tpu",
            )
            reordered_x = out.transpose(0, 2, 3, 1, 4).reshape(
                B, num_cuboids, cuboid_volume, self.dim
            )
            if self.use_final_proj:
                reordered_x = nn.Dense(self.dim, name="proj",
                                       kernel_init=linear_init(self.ffn_linear_init_mode))(reordered_x)
                reordered_x = nn.Dropout(self.proj_drop)(reordered_x, deterministic=deterministic)
            shifted_x = cuboid_reorder_reverse(
                reordered_x, cuboid_size=cuboid_size, strategy=self.strategy,
                orig_data_shape=(T + pad_t, H + pad_h, W + pad_w),
            )
            if any(s > 0 for s in shift_size):
                x = jnp.roll(shifted_x, shift=shift_size, axis=(1, 2, 3))
            else:
                x = shifted_x
            return generalize_unpadding(x, pad_t=pad_t, pad_h=pad_h, pad_w=pad_w,
                                        padding_type=self.padding_type)

        q = q * scale
        attn_score = jnp.einsum("bnihc,bnjhc->bnhij", q, k)
        if bias is not None:
            attn_score = attn_score + bias[None, None]

        attn_dropout = nn.Dropout(self.attn_drop)
        new_global_vector = None

        if self.use_global_vector:
            if self.separate_global_qkv:
                l2g_q = nn.Dense(self.dim, use_bias=self.qkv_bias, name="l2g_q_net",
                                 kernel_init=linear_init(self.attn_linear_init_mode))(reordered_x)
                l2g_q = l2g_q.reshape(B, num_cuboids, cuboid_volume, self.num_heads, head_C) * scale
                l2g_kv = nn.Dense(self.dim * 2, use_bias=self.qkv_bias, name="l2g_global_kv_net",
                                  kernel_init=linear_init(self.attn_linear_init_mode))(global_vectors)
                l2g_kv = l2g_kv.reshape(B, num_global, 2, self.num_heads, head_C)
                l2g_global_k, l2g_global_v = l2g_kv[:, :, 0], l2g_kv[:, :, 1]  # (B, N, heads, head_C)
                g2l_global_q = nn.Dense(self.dim, use_bias=self.qkv_bias, name="g2l_global_q_net",
                                        kernel_init=linear_init(self.attn_linear_init_mode))(global_vectors)
                g2l_global_q = g2l_global_q.reshape(B, num_global, self.num_heads, head_C) * scale
                g2l_k = nn.Dense(self.dim, use_bias=self.qkv_bias, name="g2l_k_net",
                                 kernel_init=linear_init(self.attn_linear_init_mode))(reordered_x)
                g2l_k = g2l_k.reshape(B, num_cuboids, cuboid_volume, self.num_heads, head_C)
                g2l_v = nn.Dense(gC, use_bias=self.qkv_bias, name="g2l_v_net",
                                 kernel_init=linear_init(self.attn_linear_init_mode))(reordered_x)
                global_head_C = gC // self.num_heads
                g2l_v = g2l_v.reshape(B, num_cuboids, cuboid_volume, self.num_heads, global_head_C)
                if self.use_global_self_attn:
                    g2g_qkv = nn.Dense(gC * 3, use_bias=self.qkv_bias, name="g2g_global_qkv_net",
                                       kernel_init=linear_init(self.attn_linear_init_mode))(global_vectors)
                    g2g_qkv = g2g_qkv.reshape(B, num_global, 3, self.num_heads, global_head_C)
                    g2g_global_q = g2g_qkv[:, :, 0] * scale
                    g2g_global_k, g2g_global_v = g2g_qkv[:, :, 1], g2g_qkv[:, :, 2]
            else:
                global_head_C = head_C
                q_global_kv = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, name="global_qkv",
                                       kernel_init=linear_init(self.attn_linear_init_mode))(global_vectors)
                q_global_kv = q_global_kv.reshape(B, num_global, 3, self.num_heads, head_C)
                q_global = q_global_kv[:, :, 0] * scale
                k_global, v_global = q_global_kv[:, :, 1], q_global_kv[:, :, 2]
                l2g_q, g2l_k, g2l_v = q, k, v
                g2l_global_q, l2g_global_k, l2g_global_v = q_global, k_global, v_global
                if self.use_global_self_attn:
                    g2g_global_q, g2g_global_k, g2g_global_v = q_global, k_global, v_global

            # local-to-global attention appended as extra keys
            l2g_attn_score = jnp.einsum("bnihc,bghc->bnhig", l2g_q, l2g_global_k)
            attn_score_l2l_l2g = jnp.concatenate([attn_score, l2g_attn_score], axis=-1)
            if attn_mask is not None:
                # (1, nC, 1, vol, vol + N): broadcasts over batch and heads
                m = attn_mask[None, :, None]
                mask_l2l_l2g = jnp.concatenate(
                    [m, jnp.ones(m.shape[:-1] + (num_global,), dtype=m.dtype)],
                    axis=-1,
                )
            else:
                mask_l2l_l2g = None
            v_l_g = jnp.concatenate(
                [
                    v,
                    jnp.broadcast_to(
                        l2g_global_v[:, None], (B, num_cuboids, num_global, self.num_heads, head_C)
                    ),
                ],
                axis=2,
            )
            attn_w = masked_softmax(attn_score_l2l_l2g, mask_l2l_l2g)
            attn_w = attn_dropout(attn_w, deterministic=deterministic)
            reordered_x = jnp.einsum("bnhij,bnjhc->bnihc", attn_w, v_l_g)
            reordered_x = reordered_x.reshape(B, num_cuboids, cuboid_volume, self.dim)

            # global update: attend over all local cells (+ optionally globals)
            if self.padding_type == "ignore":
                g2l_mask = np.ones((1, T, H, W, 1), dtype=np.float32)
                g2l_mask = np.pad(g2l_mask, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0)))
                if any(s > 0 for s in shift_size):
                    g2l_mask = np.roll(
                        g2l_mask, shift=(-shift_size[0], -shift_size[1], -shift_size[2]),
                        axis=(1, 2, 3),
                    )
                g2l_attn_mask = jnp.asarray(g2l_mask.reshape(-1))
            else:
                g2l_attn_mask = None
            g2l_k_flat = g2l_k.reshape(B, num_cuboids * cuboid_volume, self.num_heads, head_C)
            g2l_attn_score = jnp.einsum("bghc,blhc->bhgl", g2l_global_q, g2l_k_flat)
            if self.use_global_self_attn:
                g2g_attn_score = jnp.einsum("bghc,bkhc->bhgk", g2g_global_q, g2g_global_k)
                g2all_attn_score = jnp.concatenate([g2l_attn_score, g2g_attn_score], axis=-1)
                if g2l_attn_mask is not None:
                    g2all_attn_mask = jnp.concatenate(
                        [g2l_attn_mask, jnp.ones((num_global,), dtype=g2l_attn_mask.dtype)]
                    )
                else:
                    g2all_attn_mask = None
                new_v = jnp.concatenate(
                    [
                        g2l_v.reshape(B, num_cuboids * cuboid_volume, self.num_heads, global_head_C),
                        g2g_global_v.reshape(B, num_global, self.num_heads, global_head_C),
                    ],
                    axis=1,
                )
            else:
                g2all_attn_score = g2l_attn_score
                g2all_attn_mask = g2l_attn_mask
                new_v = g2l_v.reshape(B, num_cuboids * cuboid_volume, self.num_heads, global_head_C)
            g2all_w = masked_softmax(g2all_attn_score, g2all_attn_mask)
            g2all_w = nn.Dropout(self.attn_drop, name="global_attn_drop")(
                g2all_w, deterministic=deterministic
            )
            new_global_vector = jnp.einsum("bhgl,blhc->bghc", g2all_w, new_v)
            new_global_vector = new_global_vector.reshape(B, num_global, gC)
        else:
            attn_w = masked_softmax(attn_score, attn_mask[None, :, None] if attn_mask is not None else None)
            attn_w = attn_dropout(attn_w, deterministic=deterministic)
            reordered_x = jnp.einsum("bnhij,bnjhc->bnihc", attn_w, v)
            reordered_x = reordered_x.reshape(B, num_cuboids, cuboid_volume, self.dim)

        if self.use_final_proj:
            reordered_x = nn.Dense(self.dim, name="proj",
                                   kernel_init=linear_init(self.ffn_linear_init_mode))(reordered_x)
            reordered_x = nn.Dropout(self.proj_drop)(reordered_x, deterministic=deterministic)
            if self.use_global_vector:
                new_global_vector = nn.Dense(gC, name="global_proj",
                                             kernel_init=linear_init(self.ffn_linear_init_mode))(new_global_vector)
                new_global_vector = nn.Dropout(self.proj_drop, name="global_proj_drop")(
                    new_global_vector, deterministic=deterministic
                )

        shifted_x = cuboid_reorder_reverse(
            reordered_x, cuboid_size=cuboid_size, strategy=self.strategy,
            orig_data_shape=(T + pad_t, H + pad_h, W + pad_w),
        )
        if any(s > 0 for s in shift_size):
            x = jnp.roll(shifted_x, shift=shift_size, axis=(1, 2, 3))
        else:
            x = shifted_x
        x = generalize_unpadding(x, pad_t=pad_t, pad_h=pad_h, pad_w=pad_w,
                                 padding_type=self.padding_type)
        if self.use_global_vector:
            return x, new_global_vector
        return x


class StackCuboidSelfAttentionBlock(nn.Module):
    """Residual stack of cuboid attentions + FFNs (ref :969).

    use_inter_ffn=True:  x -> (attn_i + res) -> ffn_i, for each pattern i
    use_inter_ffn=False: x -> (attn_i + res)*  -> single ffn
    """

    dim: int
    num_heads: int
    block_cuboid_size: Sequence[Tuple[int, int, int]] = ((4, 4, 4), (4, 4, 4))
    block_shift_size: Sequence[Tuple[int, int, int]] = ((0, 0, 0), (2, 2, 2))
    block_strategy: Sequence[Tuple[str, str, str]] = (("d", "d", "d"), ("l", "l", "l"))
    padding_type: str = "ignore"
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    ffn_drop: float = 0.0
    activation: str = "leaky"
    gated_ffn: bool = False
    use_inter_ffn: bool = False
    use_global_vector: bool = False
    use_global_vector_ffn: bool = True
    use_global_self_attn: bool = False
    separate_global_qkv: bool = False
    global_dim_ratio: int = 1
    use_relative_pos: bool = True
    use_pallas_attention: Union[bool, str] = False
    use_pallas_ffn: Union[bool, str] = False
    use_pallas_dropout: Union[bool, str] = "auto"
    use_final_proj: bool = True
    checkpoint_level: int = 0
    attn_linear_init_mode: str = "0"
    ffn_linear_init_mode: str = "0"
    ffn2_linear_init_mode: str = "2"
    attn_proj_linear_init_mode: str = "2"

    def setup(self):
        assert (
            len(self.block_cuboid_size) == len(self.block_shift_size) == len(self.block_strategy)
        )
        self.num_attn = len(self.block_cuboid_size)
        num_ffn = self.num_attn if self.use_inter_ffn else 1
        self.ffn_l = [
            PositionwiseFFN(
                units=self.dim,
                hidden_size=4 * self.dim,
                activation_dropout=self.ffn_drop,
                dropout=self.ffn_drop,
                gated_proj=self.gated_ffn,
                activation=self.activation,
                pre_norm=True,
                use_pallas=self.use_pallas_ffn,
                use_pallas_dropout=self.use_pallas_dropout,
                linear_init_mode=self.ffn_linear_init_mode,
                ffn2_linear_init_mode=self.ffn2_linear_init_mode,
                name=f"ffn_l_{i}",
            )
            for i in range(num_ffn)
        ]
        if self.use_global_vector_ffn and self.use_global_vector:
            self.global_ffn_l = [
                PositionwiseFFN(
                    units=self.global_dim_ratio * self.dim,
                    hidden_size=self.global_dim_ratio * 4 * self.dim,
                    activation_dropout=self.ffn_drop,
                    dropout=self.ffn_drop,
                    gated_proj=self.gated_ffn,
                    activation=self.activation,
                    pre_norm=True,
                    linear_init_mode=self.ffn_linear_init_mode,
                    ffn2_linear_init_mode=self.ffn2_linear_init_mode,
                    name=f"global_ffn_l_{i}",
                )
                for i in range(num_ffn)
            ]
        self.attn_l = [
            CuboidSelfAttentionLayer(
                dim=self.dim,
                num_heads=self.num_heads,
                cuboid_size=tuple(cs),
                shift_size=tuple(ss),
                strategy=tuple(st),
                padding_type=self.padding_type,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                attn_drop=self.attn_drop,
                proj_drop=self.proj_drop,
                use_global_vector=self.use_global_vector,
                use_global_self_attn=self.use_global_self_attn,
                separate_global_qkv=self.separate_global_qkv,
                global_dim_ratio=self.global_dim_ratio,
                use_relative_pos=self.use_relative_pos,
                use_pallas_attention=self.use_pallas_attention,
                use_pallas_dropout=self.use_pallas_dropout,
                use_final_proj=self.use_final_proj,
                attn_linear_init_mode=self.attn_linear_init_mode,
                ffn_linear_init_mode=self.attn_proj_linear_init_mode,
                name=f"attn_l_{i}",
            )
            for i, (cs, ss, st) in enumerate(
                zip(self.block_cuboid_size, self.block_shift_size, self.block_strategy)
            )
        ]

    def __call__(self, x, global_vectors=None, deterministic: bool = True):
        # Note on checkpoint_level: the reference checkpoints attention (>=2)
        # and FFN (>=1) activations per block.  On TPU we instead apply
        # jax.checkpoint policies at the train-step level (see
        # prediff_tpu/training), which XLA schedules better than per-module
        # remat; checkpoint_level is kept for config parity.
        def attn_step(i, x, gv):
            attn = self.attn_l[i]
            if self.use_global_vector:
                x_out, gv_out = attn(x, gv, deterministic=deterministic)
                return x + x_out, gv + gv_out
            return x + attn(x, deterministic=deterministic), gv

        if self.use_inter_ffn:
            for i in range(self.num_attn):
                x, global_vectors = attn_step(i, x, global_vectors)
                x = self.ffn_l[i](x, deterministic=deterministic)
                if self.use_global_vector and self.use_global_vector_ffn:
                    global_vectors = self.global_ffn_l[i](global_vectors, deterministic=deterministic)
        else:
            for i in range(self.num_attn):
                x, global_vectors = attn_step(i, x, global_vectors)
            x = self.ffn_l[0](x, deterministic=deterministic)
            if self.use_global_vector and self.use_global_vector_ffn:
                global_vectors = self.global_ffn_l[0](global_vectors, deterministic=deterministic)
        if self.use_global_vector:
            return x, global_vectors
        return x
