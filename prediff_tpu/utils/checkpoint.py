"""Checkpoint save/load: orbax for native checkpoints + readers for the
reference's published PyTorch state_dicts.

Reference parity (SURVEY.md §5 checkpoint/resume): three layers —
  1. training checkpoints with step/opt-state (orbax <- Lightning ckpts)
  2. bare model state_dicts (sevirlr_earthformerunet.pt etc.,
     train_sevirlr_prediff.py:1202-1215) <- convert_torch_state_dict
  3. published pretrained weights (utils/download.py:5-25)
"""
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

_LAYOUT_FIELDS = ("pack_small_thr", "flat_update")
_LAYOUT_FILE = "state_layout.json"


def _state_layout(state: Any) -> Optional[Dict[str, int]]:
    """Static layout knobs that change the SAVED pytree structure (packed
    opt_state/ema_params) — recorded so a mismatched restore fails clearly
    instead of with an opaque pytree-structure error."""
    layout = {
        f: int(getattr(state, f)) for f in _LAYOUT_FIELDS if hasattr(state, f)
    }
    return layout or None


def save_checkpoint(path: str, state: Any, step: Optional[int] = None,
                    keep: Optional[int] = 3):
    """Save a pytree train state with orbax.  ``keep=None`` disables orbax
    recency pruning (used by CheckpointTracker, which retains checkpoints by
    monitored score instead — Lightning save_top_k semantics)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    layout = _state_layout(state)
    if layout is not None:
        with open(os.path.join(path, _LAYOUT_FILE), "w") as f:
            json.dump(layout, f)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as mngr:
        step = int(step if step is not None else jax.device_get(state.step))
        mngr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        mngr.wait_until_finished()


def delete_checkpoint(path: str, step: int):
    """Remove one saved step (no-op when absent)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mngr:
        if step in mngr.all_steps():
            mngr.delete(step)


def restore_checkpoint(path: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore a pytree saved with :func:`save_checkpoint`; ``target`` supplies
    structure/dtypes.  Raises a clear error when the checkpoint was saved
    under a different packed-state layout (``pack_small_thr``/``flat_update``)
    than ``target`` uses."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    layout_path = os.path.join(path, _LAYOUT_FILE)
    want = _state_layout(target)
    if want is not None and os.path.exists(layout_path):
        with open(layout_path) as f:
            saved = json.load(f)
        mismatched = {
            k: (saved[k], want[k])
            for k in want if k in saved and saved[k] != want[k]
        }
        if mismatched:
            raise ValueError(
                "checkpoint state-layout mismatch: the checkpoint at "
                f"{path} was saved with "
                + ", ".join(f"{k}={s}" for k, (s, _) in mismatched.items())
                + " but the restore target uses "
                + ", ".join(f"{k}={w}" for k, (_, w) in mismatched.items())
                + "; recreate the train state with the saved settings "
                "(opt_state/ema_params are stored in the packed layout)"
            )
    with ocp.CheckpointManager(path) as mngr:
        step = int(step if step is not None else mngr.latest_step())
        return mngr.restore(
            step, args=ocp.args.StandardRestore(jax.device_get(target))
        )


def save_params_npz(path: str, params: Dict):
    """Flat .npz export of a params tree (portable, torch-free)."""
    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, prefix + k + "/")
        else:
            flat[prefix[:-1]] = np.asarray(tree)

    walk(params)
    np.savez(path, **flat)


def load_params_npz(path: str) -> Dict:
    data = np.load(path)
    tree: Dict = {}
    for key in data.files:
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def load_pretrained_torch(path: str, flax_params: Dict, prefix: str = "",
                          strict: bool = True) -> Dict:
    """Load a reference .pt checkpoint into a flax params tree (requires
    torch; see prediff_tpu.utils.convert)."""
    from .convert import convert_torch_state_dict, load_torch_checkpoint

    state_dict = load_torch_checkpoint(path)
    return convert_torch_state_dict(state_dict, flax_params, prefix=prefix,
                                    strict=strict)


PRETRAINED_NAMES = {
    # name -> published file (ref utils/download.py:5-25); download requires
    # network access (OneDrive links) — provide files locally.
    "vae": "pretrained_sevirlr_vae_8x8x64_v1.pt",
    "earthformerunet": "pretrained_sevirlr_earthformerunet_v1.pt",
    "alignment": "pretrained_sevirlr_alignment_avg_x_cuboid_v1.pt",
    "i3d400": "pretrained_i3d_400.pt",
    "i3d600": "pretrained_i3d_600.pt",
}
