#!/usr/bin/env python
"""Generate SEVIR-LR forecasts with PreDiff (inference entrypoint).

Loads the pipeline (optionally from published pretrained .pt weights),
samples N ensemble members per context, writes .npy forecasts and optional
PNG visualizations.

Usage:
  python scripts/sample_prediff.py --out forecasts/ --synthetic --num-samples 2 --ddim-steps 50
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="forecasts", type=str)
    p.add_argument("--cfg", default=None, type=str)
    p.add_argument("--pretrained-dir", default=None, type=str)
    p.add_argument("--sevir-dir", default=None, type=str)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--num-contexts", default=1, type=int)
    p.add_argument("--num-samples", default=1, type=int)
    p.add_argument("--use-alignment", action="store_true")
    p.add_argument("--guidance-every-k", default=1, type=int,
                   help="apply the alignment mean shift only every k-th "
                        "step, scaled by k (opt-in speed/semantics trade)")
    p.add_argument("--ddim-steps", default=None, type=int,
                   help="use the DDIM fast sampler with this many steps")
    p.add_argument("--timesteps", default=None, type=int)
    p.add_argument("--vis", action="store_true", help="also save PNG panels")
    p.add_argument("--seed", default=0, type=int)
    return p.parse_args()


def main():
    args = parse_args()
    from prediff_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()
    import jax
    import jax.numpy as jnp

    from prediff_tpu.config import prediff_default_config, load_config
    from prediff_tpu.factory import build_pipeline
    from prediff_tpu.datasets import SEVIRDataModule, make_synthetic_sevir_lr
    from prediff_tpu.diffusion.knowledge_alignment import get_alignment_kwargs_avg_x
    from prediff_tpu.utils.checkpoint import load_pretrained_torch, PRETRAINED_NAMES
    from prediff_tpu.utils.layout import layout_to_in_out_slice

    cfg = load_config(prediff_default_config, args.cfg)
    os.makedirs(args.out, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    sevir_dir = args.sevir_dir
    if args.synthetic:
        sevir_dir = os.path.join(args.out, "synthetic_sevirlr")
        if not os.path.exists(sevir_dir):
            make_synthetic_sevir_lr(sevir_dir, num_events=8,
                                    H=cfg.layout.img_height,
                                    W=cfg.layout.img_width, T=25)
    dm = SEVIRDataModule(
        seq_len=cfg.dataset.seq_len, stride=cfg.dataset.stride, layout="NTHWC",
        dataset_name=cfg.dataset.dataset_name, sevir_dir=sevir_dir,
        train_test_split_date=cfg.dataset.train_test_split_date,
        val_ratio=cfg.dataset.val_ratio, batch_size=1, seed=args.seed,
    )
    dm.setup()

    ld, params = build_pipeline(cfg, rng=rng, with_alignment=args.use_alignment)
    if args.pretrained_dir:
        params["vae"] = load_pretrained_torch(
            os.path.join(args.pretrained_dir, PRETRAINED_NAMES["vae"]), params["vae"])
        params["unet"] = load_pretrained_torch(
            os.path.join(args.pretrained_dir, PRETRAINED_NAMES["earthformerunet"]),
            params["unet"])
        if args.use_alignment:
            params["align"] = load_pretrained_torch(
                os.path.join(args.pretrained_dir, PRETRAINED_NAMES["alignment"]),
                params["align"])
            ld.alignment = ld.alignment.replace(params=params["align"])

    in_slice, out_slice = layout_to_in_out_slice(
        cfg.layout.layout, cfg.layout.in_len, cfg.layout.out_len)
    sampler_kwargs = {}
    if args.ddim_steps:
        sampler_kwargs = dict(sampler="ddim", ddim_steps=args.ddim_steps)
    if args.timesteps:
        sampler_kwargs["timesteps"] = args.timesteps

    for cidx, batch in enumerate(dm.test_batches()):
        if cidx >= args.num_contexts:
            break
        batch = jnp.asarray(batch)
        y = batch[in_slice]
        x = batch[out_slice]
        preds = []
        for i in range(args.num_samples):
            kwargs = dict(sampler_kwargs)
            if args.use_alignment:
                kwargs.update(
                    use_alignment=True,
                    alignment_kwargs=get_alignment_kwargs_avg_x(x),
                    guidance_every_k=args.guidance_every_k,
                )
            pred = ld.sample(
                params["unet"], params["vae"],
                jax.random.fold_in(rng, cidx * 997 + i), y, **kwargs,
            )
            preds.append(np.asarray(pred))
            np.save(os.path.join(args.out, f"ctx{cidx}_sample{i}.npy"), preds[-1])
        if args.vis:
            from prediff_tpu.datasets.visualization import vis_sevir_seq

            vis_sevir_seq(
                os.path.join(args.out, f"ctx{cidx}.png"),
                seq=[np.asarray(y[0]), np.asarray(x[0])]
                + [p[0] for p in preds],
                label=["context", "target"]
                + [f"pred_{i}" for i in range(len(preds))],
                interval_real_time=cfg.dataset.interval_real_time,
                plot_stride=cfg.dataset.plot_stride,
            )
        print(f"context {cidx}: wrote {len(preds)} forecast(s)")


if __name__ == "__main__":
    main()
