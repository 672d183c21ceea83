#!/usr/bin/env python
"""Convert the reference's published PyTorch checkpoints to native .npz params.

Usage:
  python scripts/convert_pretrained.py --pt-dir /path/to/pt --out weights/
Converts: pretrained_sevirlr_vae_8x8x64_v1.pt,
          pretrained_sevirlr_earthformerunet_v1.pt,
          pretrained_sevirlr_alignment_avg_x_cuboid_v1.pt
(whichever are present)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pt-dir", required=True)
    p.add_argument("--out", default="weights")
    args = p.parse_args()

    from prediff_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp
    from prediff_tpu.config import prediff_default_config
    from prediff_tpu.factory import (
        build_unet, build_vae, build_alignment_model, init_model_params,
    )
    from prediff_tpu.utils.checkpoint import (
        load_pretrained_torch, save_params_npz, PRETRAINED_NAMES,
    )

    cfg = prediff_default_config()
    rng = jax.random.PRNGKey(0)
    os.makedirs(args.out, exist_ok=True)
    jobs = {}
    d = cfg.model.diffusion
    vae_path = os.path.join(args.pt_dir, PRETRAINED_NAMES["vae"])
    if os.path.exists(vae_path):
        vae = build_vae(cfg)
        params = init_model_params(
            vae, rng, jnp.zeros((1, cfg.layout.img_height, cfg.layout.img_width,
                                 cfg.model.vae.in_channels)))
        jobs["vae"] = (vae_path, params)
    unet_path = os.path.join(args.pt_dir, PRETRAINED_NAMES["earthformerunet"])
    if os.path.exists(unet_path):
        unet = build_unet(cfg)
        params = init_model_params(
            unet, rng, jnp.zeros((1,) + tuple(d.latent_shape)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,) + tuple(d.latent_cond_shape)))
        jobs["earthformerunet"] = (unet_path, params)
    align_path = os.path.join(args.pt_dir, PRETRAINED_NAMES["alignment"])
    if os.path.exists(align_path):
        model = build_alignment_model(cfg)
        params = init_model_params(
            model, rng,
            jnp.zeros((1,) + tuple(cfg.model.align.model_args.input_shape)),
            jnp.zeros((1,), jnp.int32))
        jobs["alignment"] = (align_path, params)

    for name, (path, init_params) in jobs.items():
        converted = load_pretrained_torch(path, init_params)
        out_path = os.path.join(args.out, f"{name}.npz")
        save_params_npz(out_path, converted)
        print(f"converted {path} -> {out_path}")
    if not jobs:
        print("no known pretrained files found in", args.pt_dir)


if __name__ == "__main__":
    main()
