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


def _reorder_axes(cuboid_size, sizes, strategy):
    """Shared axis bookkeeping for the local ('l') / dilated ('d') split."""
    intermediate_shape = []
    nblock_axis = []
    block_axis = []
    for i, (block_size, total_size, ele_strategy) in enumerate(
        zip(cuboid_size, sizes, strategy)
    ):
        if ele_strategy == "l":
            intermediate_shape.extend([total_size // block_size, block_size])
            nblock_axis.append(2 * i + 1)
            block_axis.append(2 * i + 2)
        elif ele_strategy == "d":
            intermediate_shape.extend([block_size, total_size // block_size])
            nblock_axis.append(2 * i + 2)
            block_axis.append(2 * i + 1)
        else:
            raise NotImplementedError(f"strategy '{ele_strategy}'")
    return intermediate_shape, nblock_axis, block_axis


def cuboid_reorder(data, cuboid_size, strategy):
    """(B, T, H, W, C) -> (B, num_cuboids, cuboid_volume, C).

    Shapes must be divisible by the cuboid sizes (pad first).
    Works for both jnp and np arrays.
    """
    B, T, H, W, C = data.shape
    num_cuboids = (T // cuboid_size[0]) * (H // cuboid_size[1]) * (W // cuboid_size[2])
    cuboid_volume = cuboid_size[0] * cuboid_size[1] * cuboid_size[2]
    intermediate_shape, nblock_axis, block_axis = _reorder_axes(
        cuboid_size, (T, H, W), strategy
    )
    data = data.reshape((B,) + tuple(intermediate_shape) + (C,))
    perm = (0,) + tuple(nblock_axis) + tuple(block_axis) + (7,)
    data = data.transpose(perm)
    return data.reshape((B, num_cuboids, cuboid_volume, C))


def cuboid_reorder_reverse(data, cuboid_size, strategy, orig_data_shape):
    """Inverse of :func:`cuboid_reorder`."""
    B, num_cuboids, cuboid_volume, C = data.shape
    T, H, W = orig_data_shape
    permutation_axis = [0]
    for i, (block_size, total_size, ele_strategy) in enumerate(
        zip(cuboid_size, (T, H, W), strategy)
    ):
        if ele_strategy == "l":
            permutation_axis.append(i + 1)
            permutation_axis.append(i + 4)
        elif ele_strategy == "d":
            permutation_axis.append(i + 4)
            permutation_axis.append(i + 1)
        else:
            raise NotImplementedError(f"strategy '{ele_strategy}'")
    permutation_axis.append(7)
    data = data.reshape(
        (
            B,
            T // cuboid_size[0],
            H // cuboid_size[1],
            W // cuboid_size[2],
            cuboid_size[0],
            cuboid_size[1],
            cuboid_size[2],
            C,
        )
    )
    data = data.transpose(tuple(permutation_axis))
    return data.reshape((B, T, H, W, C))


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

    # Swin-style region ids: cells in the same pre-shift region may attend.
    shift_mask = np.zeros((1, T + pad_t, H + pad_h, W + pad_w, 1), dtype=np.float64)
    cnt = 0
    for t in (
        slice(-cuboid_size[0]),
        slice(-cuboid_size[0], -shift_size[0]),
        slice(-shift_size[0], None),
    ):
        for h in (
            slice(-cuboid_size[1]),
            slice(-cuboid_size[1], -shift_size[1]),
            slice(-shift_size[1], None),
        ):
            for w in (
                slice(-cuboid_size[2]),
                slice(-cuboid_size[2], -shift_size[2]),
                slice(-shift_size[2], None),
            ):
                shift_mask[:, t, h, w, :] = cnt
                cnt += 1
    shift_mask = cuboid_reorder(shift_mask, cuboid_size, strategy=strategy)
    shift_mask = shift_mask[0, :, :, 0]  # (num_cuboids, cuboid_volume)
    attn_mask = (shift_mask[:, None, :] - shift_mask[:, :, None]) == 0
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
