#!/usr/bin/env python
"""Pre-encode the SEVIR(-LR) dataset into a VAE latent cache.

The frozen first stage is ~14% of the pixel-input train step's device time
(probe56); caching its moments once removes it from every training step of
the diffusion model AND the knowledge-alignment network.  Augmentation mode
"2" (the PreDiff v1 setting) is preserved exactly by caching all 8 dihedral
variants (--aug d4); see prediff_tpu/datasets/latents.py.

Usage:
  python scripts/precompute_latents.py --out latents.h5 --sevir-dir /data/sevirlr \
      --cfg configs/prediff_sevirlr_v1.yaml --pretrained-dir /path/to/pt --aug d4
  python scripts/precompute_latents.py --out /tmp/l.h5 --synthetic --aug d4   # smoke

Then train from the cache:
  python scripts/train_sevirlr_prediff.py ... --latents latents.h5
  python scripts/train_sevirlr_avg_x.py   ... --latents latents.h5
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, type=str, help="output .h5 path")
    p.add_argument("--cfg", default=None, type=str)
    p.add_argument("--sevir-dir", default=None, type=str)
    p.add_argument("--synthetic", action="store_true",
                   help="generate + encode a synthetic SEVIR-LR dataset")
    p.add_argument("--pretrained-dir", default=None, type=str,
                   help="directory with the published VAE .pt (else random "
                        "init — smoke/testing only)")
    p.add_argument("--aug", default="d4", choices=["none", "d4"],
                   help="d4: cache all 8 flip/rot90 variants (needed for "
                        "aug_mode '2' training); none: 1 variant")
    p.add_argument("--dtype", default="float16", choices=["float16", "float32"],
                   help="storage dtype of the cached moments")
    p.add_argument("--frame-batch", default=32, type=int,
                   help="frames per encoder dispatch (one compiled shape)")
    return p.parse_args()


def main():
    args = parse_args()
    from prediff_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax

    from prediff_tpu.config import prediff_default_config, load_config
    from prediff_tpu.factory import build_pipeline
    from prediff_tpu.datasets import SEVIRDataLoader, make_synthetic_sevir_lr
    from prediff_tpu.datasets.latents import write_latent_cache
    from prediff_tpu.utils.checkpoint import load_pretrained_torch, PRETRAINED_NAMES

    cfg = load_config(prediff_default_config, args.cfg)
    sevir_dir = args.sevir_dir
    if args.synthetic:
        sevir_dir = os.path.join(os.path.dirname(os.path.abspath(args.out)),
                                 "synthetic_sevirlr")
        if not os.path.exists(sevir_dir):
            make_synthetic_sevir_lr(sevir_dir, num_events=16,
                                    H=cfg.layout.img_height,
                                    W=cfg.layout.img_width, T=25)
    if sevir_dir is None:
        raise ValueError("pass --sevir-dir /path/to/sevirlr or --synthetic")

    rng = jax.random.PRNGKey(cfg.optim.seed)
    ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
    if args.pretrained_dir:
        params["vae"] = load_pretrained_torch(
            os.path.join(args.pretrained_dir, PRETRAINED_NAMES["vae"]),
            params["vae"],
        )
    else:
        print("WARNING: no --pretrained-dir; encoding with randomly "
              "initialized VAE weights (smoke/testing only)", flush=True)

    vae_params = params["vae"]
    encode = jax.jit(lambda f: ld.first_stage_moments(vae_params, f))
    # recorded in the cache meta: the exactness-vs-pixel-path guarantee
    # holds when the training step's encode dtype matches this
    encode_dtype = str(np.dtype(
        ld._resolved_first_stage_dtype(n_frames=args.frame_batch)))

    raw_seq_len = {"sevir": 49, "sevirlr": 25}[cfg.dataset.dataset_name]
    # full date range + single shard: the cache covers the whole catalog so
    # any date-filtered training split can map onto it by event key
    loader = SEVIRDataLoader(
        data_types=["vil"],
        seq_len=cfg.dataset.seq_len,
        raw_seq_len=raw_seq_len,
        sample_mode="sequent",
        stride=cfg.dataset.stride,
        batch_size=1,
        layout="NTHWC",
        sevir_catalog=os.path.join(sevir_dir, "CATALOG.csv"),
        sevir_data_dir=os.path.join(sevir_dir, "data"),
        shuffle=False,
        output_type=np.float32,
        preprocess=True,
        rescale_method="01",
    )
    print(f"encoding {loader.total_num_event} events "
          f"x {8 if args.aug == 'd4' else 1} variant(s) "
          f"x {raw_seq_len} frames -> {args.out}", flush=True)
    write_latent_cache(
        args.out, loader, encode, aug=args.aug, moments_dtype=args.dtype,
        frame_batch=args.frame_batch, verbose=True, encode_dtype=encode_dtype,
    )
    loader.close()
    print(f"latent cache written: {args.out}", flush=True)


if __name__ == "__main__":
    main()
