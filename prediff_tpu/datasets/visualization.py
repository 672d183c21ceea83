"""SEVIR visualization: VIL colormap, sequence panels, hit/miss/false-alarm
maps, and GIF export.

Reference parity: vis_sevir_seq (datasets/sevir/visualization.py:45),
plot_hit_miss_fa (:22), VIL colormap constants (sevir_cmap.py — these are the
public MIT-AI-Accelerator SEVIR benchmark color levels), save_gif
(utils/gifmaker.py:5)."""
from typing import List, Optional, Sequence, Union

import numpy as np

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.colors import ListedColormap, BoundaryNorm
    from matplotlib.patches import Patch
except ImportError:  # pragma: no cover
    plt = None

# SEVIR benchmark VIL color levels (0-255 encoded scale)
VIL_COLORS = [
    [0, 0, 0],
    [0.30196078431372547, 0.30196078431372547, 0.30196078431372547],
    [0.1568627450980392, 0.7450980392156863, 0.1568627450980392],
    [0.09803921568627451, 0.5882352941176471, 0.09803921568627451],
    [0.0392156862745098, 0.4117647058823529, 0.0392156862745098],
    [0.0392156862745098, 0.29411764705882354, 0.0392156862745098],
    [0.9607843137254902, 0.9607843137254902, 0.0],
    [0.9294117647058824, 0.6745098039215687, 0.0],
    [0.9411764705882353, 0.43137254901960786, 0.0],
    [0.6274509803921569, 0.0, 0.0],
    [0.9058823529411765, 0.0, 1.0],
]
VIL_LEVELS = [0.0, 16.0, 31.0, 59.0, 74.0, 100.0, 133.0, 160.0, 181.0, 219.0, 255.0]


def vil_cmap():
    """(cmap, norm) for encoded VIL (0-255)."""
    cols = [c.copy() if isinstance(c, list) else list(c) for c in VIL_COLORS]
    under = cols[0]
    over = cols[-1]
    body = cols[1:-1]
    cmap = ListedColormap(body)
    cmap.set_bad(under)
    cmap.set_under(under)
    cmap.set_over(over)
    norm = BoundaryNorm(VIL_LEVELS[1:-1], cmap.N)
    return cmap, norm


def get_cmap(typ: str):
    """(cmap, norm, vmin, vmax) by data type; parity with sevir_cmap.get_cmap
    for the 'vil' and generic paths."""
    if typ.lower() == "vil":
        cmap, norm = vil_cmap()
        return cmap, norm, None, None
    if typ.lower() == "lght":
        return "hot", None, 0, 5
    return "jet", None, None, None


def plot_hit_miss_fa(ax, y_true, y_pred, thres: float):
    """Color-coded hit (yellow) / miss (red) / false-alarm (blue) map."""
    mask = np.zeros_like(y_true)
    mask[np.logical_and(y_true >= thres, y_pred >= thres)] = 4  # hit
    mask[np.logical_and(y_true >= thres, y_pred < thres)] = 3   # miss
    mask[np.logical_and(y_true < thres, y_pred >= thres)] = 2   # false alarm
    mask[np.logical_and(y_true < thres, y_pred < thres)] = 1    # correct reject
    cmap = ListedColormap(["silver", "dodgerblue", "tomato", "gold"])
    ax.imshow(mask, cmap=cmap, vmin=1, vmax=4)


def vis_sevir_seq(
    save_path: str,
    seq: Union[np.ndarray, Sequence[np.ndarray]],
    label: Union[str, Sequence[str]] = "pred",
    norm: Optional[dict] = None,
    interval_real_time: float = 10.0,
    plot_stride: int = 2,
    label_rotation: int = 0,
    label_offset: Sequence[float] = (-0.06, 0.4),
    label_avg_int: bool = False,
    fs: int = 10,
    max_cols: int = 10,
):
    """Multi-row sequence panel with the SEVIR VIL colormap; each row is one
    labeled sequence (context / target / predictions)."""
    assert plt is not None, "matplotlib required"
    if isinstance(seq, np.ndarray):
        seq_list = [seq.astype(np.float32)]
        label_list = [label]
    else:
        seq_list = [s.astype(np.float32) for s in seq]
        label_list = list(label)
    if norm is None:
        norm = {"scale": 255, "shift": 0}
    nrows = len(seq_list)
    ncols = min(max(len(s) for s in seq_list) // plot_stride, max_cols)
    fig, axes = plt.subplots(nrows=nrows, ncols=ncols,
                             figsize=(3 * ncols, 3 * nrows), squeeze=False)
    cmap, cnorm, vmin, vmax = get_cmap("vil")
    for i, (s, lab) in enumerate(zip(seq_list, label_list)):
        for j in range(ncols):
            t = j * plot_stride
            if t < len(s):
                frame = s[t].squeeze() * norm["scale"] + norm["shift"]
                axes[i][j].imshow(frame, cmap=cmap, norm=cnorm)
                if label_avg_int:
                    axes[i][j].set_title(f"avg={frame.mean():.1f}", fontsize=fs)
            axes[i][j].axis("off")
            if i == nrows - 1:
                axes[i][j].set_title(
                    f"{int(interval_real_time * (t + 1))} min", fontsize=fs, y=-0.2
                )
        axes[i][0].text(
            label_offset[0], label_offset[1], lab, fontsize=fs,
            rotation=label_rotation, transform=axes[i][0].transAxes,
            ha="right", va="center",
        )
    legend_elements = [
        Patch(facecolor=VIL_COLORS[i + 1],
              label=f"{int(VIL_LEVELS[i + 1])}-{int(VIL_LEVELS[i + 2])}")
        for i in range(len(VIL_COLORS) - 2)
    ]
    fig.legend(handles=legend_elements, loc="center right",
               fontsize=fs, borderaxespad=0.1)
    plt.subplots_adjust(right=0.9)
    fig.savefig(save_path, bbox_inches="tight")
    plt.close(fig)


def save_gif(single_seq: np.ndarray, fname: str, fps: int = 4):
    """Save a (T, H, W) [0,1] sequence as an animated GIF
    (parity: utils/gifmaker.py:5, PIL-based)."""
    from PIL import Image

    frames = [
        Image.fromarray((np.clip(f.squeeze(), 0, 1) * 255).astype(np.uint8))
        for f in single_seq
    ]
    frames[0].save(fname, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
