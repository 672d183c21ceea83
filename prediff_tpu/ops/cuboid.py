"""Cuboid decomposition primitives.

Reference semantics: src/prediff/models/cuboid_transformer/cuboid_transformer.py
(cuboid_reorder :388, cuboid_reorder_reverse :432,
compute_cuboid_self_attention_mask :470, masked_softmax :531,
update_cuboid_size_shift_size :563).

TPU-first design notes:
  * reorder / reverse are pure reshape+transpose — free under XLA fusion.
  * the shifted-window attention mask depends only on *static* shapes, so it is
    precomputed with numpy at trace time and baked into the compiled graph as a
    constant (the reference instead lru_caches device tensors at runtime).
"""
import functools
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

NEG_INF = -1e18


def update_cuboid_size_shift_size(data_shape, cuboid_size, shift_size, strategy):
    """Clamp cuboid/shift sizes for small inputs; dilated axes never shift."""
    new_cuboid_size = list(cuboid_size)
    new_shift_size = list(shift_size)
    for i in range(len(data_shape)):
        if strategy[i] == "d":
            new_shift_size[i] = 0
        if data_shape[i] <= cuboid_size[i]:
            new_cuboid_size[i] = data_shape[i]
            new_shift_size[i] = 0
    return tuple(new_cuboid_size), tuple(new_shift_size)


def _split_plan(cuboid_size, sizes, strategy):
    """Plan the 8-D view of (B, T, H, W, C) that separates cuboid counters
    from within-cuboid offsets.

    Each spatial axis reshapes into an (outer, inner) pair.  Under 'l'
    (local) the cuboid counter is the OUTER factor — a cuboid is a
    contiguous block.  Under 'd' (dilated) the counter is the INNER factor —
    a cuboid gathers strided positions (stride = n_cuboids along that axis).

    Returns (split_shape, perm) where ``split_shape`` is the 8-D view shape
    and ``perm`` moves all counter dims in front of all offset dims, i.e.
    ``x.reshape(split_shape).transpose(perm)`` has shape
    (B, n_t, n_h, n_w, b_t, b_h, b_w, C).
    """
    split_shape = [None] * 8
    counter_dims, offset_dims = [], []
    split_shape[0], split_shape[7] = -1, -1  # B, C filled by caller
    for ax, (block, total, how) in enumerate(zip(cuboid_size, sizes, strategy)):
        lo, hi = 2 * ax + 1, 2 * ax + 2
        if how == "l":
            split_shape[lo], split_shape[hi] = total // block, block
            counter_dims.append(lo)
            offset_dims.append(hi)
        elif how == "d":
            split_shape[lo], split_shape[hi] = block, total // block
            counter_dims.append(hi)
            offset_dims.append(lo)
        else:
            raise NotImplementedError(f"strategy '{how}'")
    perm = (0, *counter_dims, *offset_dims, 7)
    return split_shape, perm


def cuboid_reorder(data, cuboid_size, strategy):
    """(B, T, H, W, C) -> (B, num_cuboids, cuboid_volume, C).

    Shapes must be divisible by the cuboid sizes (pad first).
    Works for both jnp and np arrays; pure reshape+transpose, so XLA fuses
    it into neighbors for free.
    """
    B, T, H, W, C = data.shape
    split_shape, perm = _split_plan(cuboid_size, (T, H, W), strategy)
    split_shape[0], split_shape[7] = B, C
    x = data.reshape(tuple(split_shape)).transpose(perm)
    volume = cuboid_size[0] * cuboid_size[1] * cuboid_size[2]
    return x.reshape((B, (T * H * W) // volume, volume, C))


def cuboid_reorder_reverse(data, cuboid_size, strategy, orig_data_shape):
    """Inverse of :func:`cuboid_reorder` — derived mechanically by inverting
    the forward permutation (argsort) rather than re-casing on strategy."""
    B, num_cuboids, cuboid_volume, C = data.shape
    T, H, W = orig_data_shape
    split_shape, fwd_perm = _split_plan(cuboid_size, (T, H, W), strategy)
    split_shape[0], split_shape[7] = B, C
    # forward produced (B, counters..., offsets..., C); undo its reshape,
    # then apply the inverse permutation to recover the 8-D split view
    counters_then_offsets = tuple(split_shape[d] for d in fwd_perm)
    inv_perm = tuple(int(i) for i in np.argsort(fwd_perm))
    x = data.reshape(counters_then_offsets).transpose(inv_perm)
    return x.reshape((B, T, H, W, C))


@functools.lru_cache(maxsize=None)
def compute_cuboid_self_attention_mask(
    data_shape: Tuple[int, int, int],
    cuboid_size: Tuple[int, int, int],
    shift_size: Tuple[int, int, int],
    strategy: Tuple[str, str, str],
    padding_type: str,
) -> Optional[np.ndarray]:
    """Shifted-window + padding attention mask, computed host-side in numpy.

    Returns a bool array (num_cuboids, cuboid_volume, cuboid_volume), or None
    when the mask would be all-True (no shift, and padding is attendable) so
    callers can skip the masked softmax entirely.
    """
    T, H, W = data_shape
    pad_t = (cuboid_size[0] - T % cuboid_size[0]) % cuboid_size[0]
    pad_h = (cuboid_size[1] - H % cuboid_size[1]) % cuboid_size[1]
    pad_w = (cuboid_size[2] - W % cuboid_size[2]) % cuboid_size[2]
    any_pad = pad_t > 0 or pad_h > 0 or pad_w > 0
    any_shift = any(s > 0 for s in shift_size)

    # Fast exit: with 'zeros'/'nearest' padding the padded cells are attendable
    # and with no shift every cuboid attends to itself fully.
    if not any_shift and (padding_type != "ignore" or not any_pad):
        return None

    data_mask = None
    if padding_type == "ignore" and any_pad:
        data_mask = np.ones((1, T, H, W, 1), dtype=bool)
        data_mask = np.pad(
            data_mask, ((0, 0), (0, pad_t), (0, pad_h), (0, pad_w), (0, 0))
        )
    elif padding_type == "ignore":
        data_mask = np.ones((1, T + pad_t, H + pad_h, W + pad_w, 1), dtype=bool)
    if any_shift and padding_type == "ignore":
        data_mask = np.roll(
            data_mask, shift=(-shift_size[0], -shift_size[1], -shift_size[2]), axis=(1, 2, 3)
        )
    if padding_type == "ignore":
        data_mask = cuboid_reorder(data_mask, cuboid_size, strategy=strategy)
        data_mask = data_mask[0, :, :, 0]  # (num_cuboids, cuboid_volume)

    # Swin-style region ids, built per axis and combined (vectorized
    # re-derivation of the classic triple-slice loop): along a shifted axis
    # of padded length S, cells fall into three bands —
    #   [0, S-b)   the windows untouched by the wrap,
    #   [S-b, S-s) the last window's un-wrapped part,
    #   [S-s, S)   the wrapped tail.
    # Two cells may attend only if they share the band on EVERY axis (same
    # pre-roll window).  An unshifted axis is a single band: for 'l' its
    # windows never mix bands anyway, and a dilated ('d') axis — which is
    # never shifted — strides across the whole axis, so band splits there
    # would spuriously mask.
    def _band_ids(size: int, block: int, shift: int) -> np.ndarray:
        ids = np.zeros(size, dtype=np.int64)
        if shift > 0:
            ids[size - block:] = 1
            ids[size - shift:] = 2
        return ids

    tb = _band_ids(T + pad_t, cuboid_size[0], shift_size[0])
    hb = _band_ids(H + pad_h, cuboid_size[1], shift_size[1])
    wb = _band_ids(W + pad_w, cuboid_size[2], shift_size[2])
    region = (tb[:, None, None] * 9 + hb[None, :, None] * 3 + wb[None, None, :])
    region = cuboid_reorder(region[None, ..., None], cuboid_size,
                            strategy=strategy)[0, :, :, 0]
    attn_mask = region[:, None, :] == region[:, :, None]
    if padding_type == "ignore":
        attn_mask = data_mask[:, None, :] * data_mask[:, :, None] * attn_mask
    return np.ascontiguousarray(attn_mask)


def masked_softmax(att_score: jnp.ndarray, mask: Optional[jnp.ndarray], axis: int = -1):
    """Softmax that excludes masked (False/0) entries (ref :531).

    ``mask`` broadcasts against ``att_score``; masked positions get weight 0.
    """
    import jax.nn

    if mask is None:
        return jax.nn.softmax(att_score, axis=axis)
    att_score = jnp.where(mask, att_score, NEG_INF)
    return jax.nn.softmax(att_score, axis=axis) * mask
