#!/usr/bin/env python
"""Download the published pretrained checkpoints (requires network access).

Parity with the reference's scripts/download_pretrained.py.
Usage:
  python scripts/download_pretrained.py --model all --save pretrained/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prediff_tpu.utils.download import FILE_ID_DICT, download_pretrained_weights


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="all",
                   choices=["all"] + list(FILE_ID_DICT.keys()))
    p.add_argument("--save", default="pretrained")
    args = p.parse_args()
    names = list(FILE_ID_DICT) if args.model == "all" else [args.model]
    for name in names:
        try:
            path = download_pretrained_weights(name, save_dir=args.save)
            print("downloaded", path)
        except RuntimeError as e:
            print(f"FAILED {name}: {e}")


if __name__ == "__main__":
    main()
