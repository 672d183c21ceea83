"""Axis-layout helpers (reference parity: src/prediff/utils/layout.py).

The diffusion core is layout-polymorphic; "NTHWC" is the default and the
TPU-preferred channel-last layout.
"""
from typing import Dict, Optional, Tuple


def parse_layout_shape(layout: str) -> Dict[str, int]:
    """Map a layout string like "NTHWC" to axis indices (-1 if absent)."""
    return {
        "batch_axis": layout.find("N"),
        "t_axis": layout.find("T"),
        "h_axis": layout.find("H"),
        "w_axis": layout.find("W"),
        "c_axis": layout.find("C"),
    }


def layout_to_in_out_slice(
    layout: str, in_len: int, out_len: Optional[int] = None
) -> Tuple[tuple, tuple]:
    """Build slices selecting the context (first ``in_len``) and target frames
    along the T axis of ``layout`` (ref: utils/layout.py:5)."""
    t_axis = layout.find("T")
    num_axes = len(layout)
    in_slice = [slice(None)] * num_axes
    out_slice = [slice(None)] * num_axes
    in_slice[t_axis] = slice(None, in_len)
    if out_len is None:
        out_slice[t_axis] = slice(in_len, None)
    else:
        out_slice[t_axis] = slice(in_len, in_len + out_len)
    return tuple(in_slice), tuple(out_slice)
