"""PyTorch checkpoint -> flax params conversion.

The reference publishes pretrained PyTorch state_dicts
(ref: src/prediff/utils/download.py:5-25, pl_checkpoint.py:10-50).  Our flax
module tree mirrors the torch attribute paths with list indices merged into
the parent name (torch ``down_self_blocks.0.1.attn_l.0.qkv.weight`` ->
flax ``down_self_blocks_0_1 / attn_l_0 / qkv / kernel``), which makes the
mapping mechanical:

  torch -> flax path: fold each pure-digit component into its predecessor.
  leaf transforms (decided by the flax leaf present at that path):
    Linear  weight (out,in)        -> kernel (in,out)       [transpose]
    Conv2d  weight (O,I,kh,kw)     -> kernel (kh,kw,I,O)
    Conv3d  weight (O,I,kt,kh,kw)  -> kernel (kt,kh,kw,I,O)
    Conv1d  weight (O,I,k)         -> kernel (k,I,O)
    Norm    weight                 -> scale
    Embed   weight                 -> embedding
    anything else (bias, tables, logvar, ...) copied verbatim.
"""
from typing import Dict, Iterable, Tuple

import numpy as np

# torch buffers that have no trainable flax counterpart
DEFAULT_SKIP_SUFFIXES = (
    "relative_position_index",
    "cond_ids",
    "betas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod",
    "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod",
    "sqrt_recipm1_alphas_cumprod",
    "posterior_variance",
    "posterior_log_variance_clipped",
    "posterior_mean_coef1",
    "posterior_mean_coef2",
    "lvlb_weights",
    "num_updates",
    "decay",
    "num_batches_tracked",
    "running_mean",
    "running_var",
)


def torch_key_to_flax_path(key: str) -> Tuple[str, ...]:
    """'a.0.1.b.2.weight' -> ('a_0_1', 'b_2', 'weight')."""
    parts = key.split(".")
    merged = []
    for p in parts:
        if p.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{p}"
        else:
            merged.append(p)
    return tuple(merged)


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray]):
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def convert_torch_state_dict(
    state_dict: Dict[str, "object"],
    flax_params: Dict,
    skip_suffixes: Iterable[str] = DEFAULT_SKIP_SUFFIXES,
    strict: bool = True,
    prefix: str = "",
) -> Dict:
    """Produce a flax params tree with values taken from ``state_dict``.

    ``flax_params`` (e.g. ``model.init(...)['params']``) supplies the target
    structure; every flax leaf must be matched unless ``strict=False``.
    ``prefix`` strips a leading torch module path (e.g. ``"torch_nn_module."``).
    """
    flat_target = _flatten(flax_params)
    new_flat: Dict[Tuple[str, ...], np.ndarray] = {}
    matched = set()
    unmatched_torch = []

    for tkey, tval in state_dict.items():
        if prefix:
            if not tkey.startswith(prefix):
                continue
            key = tkey[len(prefix):]
        else:
            key = tkey
        if any(key.endswith(suf) for suf in skip_suffixes):
            continue
        base = torch_key_to_flax_path(key)
        arr = _to_numpy(tval)
        leaf = base[-1]
        candidates = []
        if leaf == "weight":
            candidates = [base[:-1] + ("kernel",), base[:-1] + ("scale",),
                          base[:-1] + ("embedding",)]
        else:
            candidates = [base]
        path = next((c for c in candidates if c in flat_target), None)
        if path is None:
            unmatched_torch.append(tkey)
            continue
        target_leaf = path[-1]
        if target_leaf == "kernel" and leaf == "weight":
            if arr.ndim == 2:
                arr = arr.T
            elif arr.ndim == 3:  # Conv1d O,I,k -> k,I,O
                arr = arr.transpose(2, 1, 0)
            elif arr.ndim == 4:  # Conv2d O,I,kh,kw -> kh,kw,I,O
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 5:  # Conv3d O,I,kt,kh,kw -> kt,kh,kw,I,O
                arr = arr.transpose(2, 3, 4, 1, 0)
        expected = flat_target[path]
        if tuple(arr.shape) != tuple(np.shape(expected)):
            raise ValueError(
                f"shape mismatch for '{tkey}' -> {'/'.join(path)}: "
                f"torch {arr.shape} vs flax {np.shape(expected)}"
            )
        new_flat[path] = arr.astype(np.asarray(expected).dtype)
        matched.add(path)

    missing_flax = [p for p in flat_target if p not in matched]
    if strict and (missing_flax or unmatched_torch):
        raise ValueError(
            "checkpoint conversion mismatch.\n"
            f"flax leaves not filled ({len(missing_flax)}): "
            f"{['/'.join(p) for p in missing_flax[:10]]}\n"
            f"torch keys unmatched ({len(unmatched_torch)}): {unmatched_torch[:10]}"
        )
    # fill any non-strict leftovers from the init tree
    for p in missing_flax:
        new_flat[p] = np.asarray(flat_target[p])
    return _unflatten(new_flat)


def extract_ema_state_dict(
    pl_state_dict: Dict[str, "object"],
    model_prefix: str = "torch_nn_module.",
    ema_prefix: str = "model_ema.",
) -> Dict[str, "object"]:
    """Recover an EMA state_dict from a Lightning PreDiff checkpoint.

    The reference's LitEma stores shadow buffers under dot-stripped names
    (utils/ema.py: ``s_name = name.replace('.', '')``); we invert that by
    matching each model param name's dot-stripped form (unambiguous for these
    models).  Returns a state_dict keyed like the live model's."""
    model_keys = [k[len(model_prefix):] for k in pl_state_dict
                  if k.startswith(model_prefix)]
    dotless = {}
    for k in model_keys:
        flat = k.replace(".", "")
        if flat in dotless:
            raise ValueError(f"ambiguous dot-stripped EMA name '{flat}'")
        dotless[flat] = k
    out = {}
    for k, v in pl_state_dict.items():
        if not k.startswith(ema_prefix):
            continue
        name = k[len(ema_prefix):]
        if name in ("decay", "num_updates"):
            continue
        if name in dotless:
            out[dotless[name]] = v
    return out


def convert_torch_batch_stats(
    state_dict: Dict[str, "object"],
    flax_batch_stats: Dict,
    prefix: str = "",
) -> Dict:
    """Fill a flax ``batch_stats`` collection from torch BatchNorm running
    stats (running_mean -> mean, running_var -> var)."""
    flat_target = _flatten(flax_batch_stats)
    new_flat = dict(flat_target)
    for tkey, tval in state_dict.items():
        if prefix:
            if not tkey.startswith(prefix):
                continue
            key = tkey[len(prefix):]
        else:
            key = tkey
        leaf = key.rsplit(".", 1)[-1]
        if leaf not in ("running_mean", "running_var"):
            continue
        base = torch_key_to_flax_path(key)[:-1]
        path = base + ("mean" if leaf == "running_mean" else "var",)
        if path in flat_target:
            new_flat[path] = _to_numpy(tval)
    return _unflatten({k: np.asarray(v) for k, v in new_flat.items()})


def load_torch_checkpoint(path: str, map_location: str = "cpu") -> Dict:
    """Read a .pt state_dict (plain or Lightning; ref pl_checkpoint.py:10)."""
    import torch

    ckpt = torch.load(path, map_location=map_location, weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def strip_prefix(state_dict: Dict, prefix: str) -> Dict:
    """Keep only keys under ``prefix`` and strip it (ref: scripts re-save bare
    'torch_nn_module.' state_dicts, train_sevirlr_prediff.py:1202-1215)."""
    return {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
