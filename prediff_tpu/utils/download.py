"""Pretrained-asset registry + download helpers.

Reference parity: src/prediff/utils/download.py:5-54 (OneDrive-hosted
pretrained weights fetched via wget) and the S3/zip SEVIR downloads
(datasets/sevir/sevir_torch_wrap.py:30-70).  In network-restricted
environments these raise with instructions instead of silently failing."""
import os
import subprocess
from typing import Optional

from .checkpoint import PRETRAINED_NAMES

# OneDrive share ids published by the reference (utils/download.py:5-25)
PRETRAINED_SEVIRLR_VAE_NAME = PRETRAINED_NAMES["vae"]
PRETRAINED_SEVIRLR_EARTHFORMERUNET_NAME = PRETRAINED_NAMES["earthformerunet"]
PRETRAINED_SEVIRLR_ALIGNMENT_NAME = PRETRAINED_NAMES["alignment"]
PRETRAINED_I3D_400_NAME = PRETRAINED_NAMES["i3d400"]
PRETRAINED_I3D_600_NAME = PRETRAINED_NAMES["i3d600"]

FILE_ID_DICT = {
    # name -> OneDrive id (see the reference for the canonical list)
    PRETRAINED_SEVIRLR_VAE_NAME: "EXistebmoGNCvGbqDxyeeRYBkHjBAzn-bPqxZC1gG0j2Qw",
    PRETRAINED_SEVIRLR_EARTHFORMERUNET_NAME: "ETXs9rdJgltCscTVXcSqZTkBCM4cpCNDKxTJKZ1sHc5DzQ",
    PRETRAINED_SEVIRLR_ALIGNMENT_NAME: "EZFe5PstpFlEuFB0LUtRcEgB2eszx8oQWGCjluw9IOGSlA",
}
ONEDRIVE_BASE = "https://deepearthoss-my.sharepoint.com/:u:/g/personal/zhihan_deepearth_onmicrosoft_com"


def download_pretrained_weights(ckpt_name: str, save_dir: Optional[str] = None,
                                exist_ok: bool = False) -> str:
    """wget a published checkpoint (requires network access)."""
    save_dir = save_dir or os.path.join(os.getcwd(), "pretrained")
    os.makedirs(save_dir, exist_ok=True)
    ckpt_path = os.path.join(save_dir, ckpt_name)
    if os.path.exists(ckpt_path) and not exist_ok:
        print(f"{ckpt_path} already exists!")
        return ckpt_path
    if ckpt_name not in FILE_ID_DICT:
        raise KeyError(f"unknown checkpoint '{ckpt_name}'; known: {list(FILE_ID_DICT)}")
    file_id = FILE_ID_DICT[ckpt_name]
    url = f"{ONEDRIVE_BASE}/{file_id}?download=1"
    try:
        subprocess.run(["wget", url, "-O", ckpt_path], check=True)
    except Exception as e:
        raise RuntimeError(
            f"download failed ({e}); in offline environments place "
            f"{ckpt_name} at {ckpt_path} manually"
        ) from e
    return ckpt_path
