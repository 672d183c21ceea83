from .cuboid import (
    cuboid_reorder,
    cuboid_reorder_reverse,
    compute_cuboid_self_attention_mask,
    update_cuboid_size_shift_size,
    masked_softmax,
)
from .pad import generalize_padding, generalize_unpadding
