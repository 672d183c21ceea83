"""Generalized 3-D padding for (B, T, H, W, C) tensors.

Reference semantics: src/prediff/models/utils.py:228-270
(`_generalize_padding` / `_generalize_unpadding`).  'zeros' pads with zeros,
'ignore' also pads with zeros but the attention mask excludes the pad,
'nearest' resizes by nearest-neighbor interpolation.
"""
import jax
import jax.numpy as jnp


def _nearest_resize_thw(x: jnp.ndarray, T_new: int, H_new: int, W_new: int) -> jnp.ndarray:
    """Nearest-neighbor resize of the T/H/W axes of a (B,T,H,W,C) tensor,
    matching torch.nn.functional.interpolate(mode='nearest') index math
    (floor(i * in / out))."""
    B, T, H, W, C = x.shape
    t_idx = (jnp.arange(T_new) * T) // T_new
    h_idx = (jnp.arange(H_new) * H) // H_new
    w_idx = (jnp.arange(W_new) * W) // W_new
    return x[:, t_idx][:, :, h_idx][:, :, :, w_idx]


def generalize_padding(x, pad_t, pad_h, pad_w, padding_type, t_pad_left=False):
    if pad_t == 0 and pad_h == 0 and pad_w == 0:
        return x
    assert padding_type in ("zeros", "ignore", "nearest")
    B, T, H, W, C = x.shape
    if padding_type == "nearest":
        return _nearest_resize_thw(x, T + pad_t, H + pad_h, W + pad_w)
    t_pad = (pad_t, 0) if t_pad_left else (0, pad_t)
    return jnp.pad(x, ((0, 0), t_pad, (0, pad_h), (0, pad_w), (0, 0)))


def generalize_unpadding(x, pad_t, pad_h, pad_w, padding_type):
    assert padding_type in ("zeros", "ignore", "nearest")
    if pad_t == 0 and pad_h == 0 and pad_w == 0:
        return x
    B, T, H, W, C = x.shape
    if padding_type == "nearest":
        return _nearest_resize_thw(x, T - pad_t, H - pad_h, W - pad_w)
    return x[:, : T - pad_t, : H - pad_h, : W - pad_w, :]
