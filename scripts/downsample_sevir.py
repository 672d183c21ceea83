#!/usr/bin/env python
"""Offline SEVIR -> SEVIR-LR downsampling (block-max over t2 h3 w3 factors).

Parity with the reference's scripts/datasets/sevir/downsample_sevir.py.
Usage:
  python scripts/downsample_sevir.py --sevir-dir /data/sevir --out /data/sevirlr
"""
import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sevir-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--t-factor", type=int, default=2)
    p.add_argument("--h-factor", type=int, default=3)
    p.add_argument("--w-factor", type=int, default=3)
    args = p.parse_args()

    from prediff_tpu.datasets import SEVIRDataLoader

    dl = SEVIRDataLoader(
        data_types=["vil"], seq_len=49, raw_seq_len=49, stride=12,
        sevir_catalog=os.path.join(args.sevir_dir, "CATALOG.csv"),
        sevir_data_dir=os.path.join(args.sevir_dir, "data"),
    )
    os.makedirs(args.out, exist_ok=True)
    dl.save_downsampled_dataset(
        os.path.join(args.out, "data"),
        downsample_dict={"vil": (args.t_factor, args.h_factor, args.w_factor)},
    )
    shutil.copy(os.path.join(args.sevir_dir, "CATALOG.csv"),
                os.path.join(args.out, "CATALOG.csv"))
    print(f"wrote downsampled dataset to {args.out}")


if __name__ == "__main__":
    main()
