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


# Dataset mirrors published by the reference (sevir_torch_wrap.py:30-70)
SEVIR_S3_BUCKET = "s3://sevir"
SEVIRLR_ZIP_URL = "https://deep-earth.s3.amazonaws.com/datasets/sevir_lr.zip"


def download_sevir(save_dir: str, data_types=("vil",)) -> str:
    """Fetch the full SEVIR dataset from its public S3 bucket into
    ``save_dir/sevir`` (catalog + per-type data dirs).  Requires the aws CLI
    and network access; raises with instructions otherwise
    (ref sevir_torch_wrap.py:30-49)."""
    dest = os.path.join(save_dir, "sevir")
    if os.path.exists(dest):
        raise FileExistsError(f"{dest} already exists")
    if subprocess.run(["which", "aws"], capture_output=True).returncode != 0:
        raise RuntimeError(
            "aws CLI not available — install it, or fetch manually:\n"
            f"  aws s3 cp --no-sign-request {SEVIR_S3_BUCKET}/CATALOG.csv {dest}/CATALOG.csv\n"
            + "".join(
                f"  aws s3 cp --no-sign-request --recursive "
                f"{SEVIR_S3_BUCKET}/data/{t} {dest}/data/{t}\n"
                for t in data_types
            )
        )
    os.makedirs(dest)
    try:
        subprocess.run(
            ["aws", "s3", "cp", "--no-sign-request",
             f"{SEVIR_S3_BUCKET}/CATALOG.csv", os.path.join(dest, "CATALOG.csv")],
            check=True,
        )
        for t in data_types:
            subprocess.run(
                ["aws", "s3", "cp", "--no-sign-request", "--recursive",
                 f"{SEVIR_S3_BUCKET}/data/{t}", os.path.join(dest, "data", t)],
                check=True,
            )
    except Exception as e:
        raise RuntimeError(
            f"SEVIR download failed ({e}); in offline environments place the "
            f"dataset (CATALOG.csv + data/) at {dest} manually"
        ) from e
    return dest


def download_sevirlr(save_dir: str) -> str:
    """Fetch SEVIR-LR (the downsampled release) as a zip into
    ``save_dir/sevirlr`` (ref sevir_torch_wrap.py:51-70)."""
    import shutil
    import urllib.request
    import zipfile

    dest = os.path.join(save_dir, "sevirlr")
    if os.path.exists(dest):
        raise FileExistsError(f"{dest} already exists")
    os.makedirs(dest)
    zip_path = os.path.join(dest, "sevir_lr.zip")
    try:
        urllib.request.urlretrieve(SEVIRLR_ZIP_URL, zip_path)
    except Exception as e:
        raise RuntimeError(
            f"SEVIR-LR download failed ({e}); in offline environments fetch "
            f"{SEVIRLR_ZIP_URL} and place its contents (CATALOG.csv + data/) "
            f"at {dest} manually"
        ) from e
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(dest)
    os.remove(zip_path)
    inner = os.path.join(dest, "sevir_lr")
    if os.path.isdir(inner):  # the zip nests everything under sevir_lr/
        for name in os.listdir(inner):
            shutil.move(os.path.join(inner, name), dest)
        os.rmdir(inner)
    return dest


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
