#!/usr/bin/env python
"""Train the knowledge-alignment network U(z_t, t, y) on SEVIR-LR avg-x.

Parity with the reference driver (scripts/alignment/sevirlr/train_sevirlr_avg_x.py):
regress per-frame mean intensity from q_sampled noisy latents.

Usage:
  python scripts/train_sevirlr_avg_x.py --save align0 --pretrained-dir /path/to/pt
  python scripts/train_sevirlr_avg_x.py --save smoke --synthetic --max-steps 5
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--save", default="tmp_align", type=str)
    p.add_argument("--cfg", default=None, type=str)
    p.add_argument("--sevir-dir", default=None, type=str)
    p.add_argument("--pretrained-dir", default=None, type=str)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--latents", default=None, type=str,
                   help="train from a pre-encoded VAE latent cache "
                        "(scripts/precompute_latents.py)")
    p.add_argument("--max-steps", default=None, type=int)
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (multi-host pod)")
    p.add_argument("--coordinator", default=None, type=str)
    return p.parse_args()


def main():
    args = parse_args()
    from prediff_tpu.utils.platform import respect_jax_platforms_env
    respect_jax_platforms_env()
    if args.multihost:
        from prediff_tpu.parallel.mesh import init_distributed
        init_distributed(coordinator_address=args.coordinator)
    import jax
    import jax.numpy as jnp

    from prediff_tpu.config import alignment_default_config, load_config, save_yaml
    from prediff_tpu.factory import build_vae, build_alignment_model
    from prediff_tpu.models.vae import AutoencoderKL
    from prediff_tpu.parallel.mesh import make_data_mesh, shard_batch
    from prediff_tpu.training.alignment_trainer import AlignmentTrainer
    from prediff_tpu.training.loop import MetricLogger
    from prediff_tpu.datasets import SEVIRDataModule, make_synthetic_sevir_lr
    from prediff_tpu.utils.checkpoint import (
        save_checkpoint, load_pretrained_torch, PRETRAINED_NAMES,
    )
    from prediff_tpu.utils.layout import layout_to_in_out_slice

    cfg = load_config(alignment_default_config, args.cfg)
    save_dir = os.path.join("experiments", args.save)
    os.makedirs(save_dir, exist_ok=True)
    save_yaml(cfg, os.path.join(save_dir, "cfg.yaml"))

    sevir_dir = args.sevir_dir
    if args.synthetic:
        sevir_dir = os.path.join(save_dir, "synthetic_sevirlr")
        if not os.path.exists(sevir_dir):
            make_synthetic_sevir_lr(sevir_dir, num_events=16,
                                    H=cfg.layout.img_height,
                                    W=cfg.layout.img_width, T=25)
    dm = SEVIRDataModule(
        seq_len=cfg.dataset.seq_len, stride=cfg.dataset.stride, layout="NTHWC",
        aug_mode=cfg.dataset.aug_mode, dataset_name=cfg.dataset.dataset_name,
        sevir_dir=sevir_dir,
        train_test_split_date=cfg.dataset.train_test_split_date,
        val_ratio=cfg.dataset.val_ratio, batch_size=cfg.optim.micro_batch_size,
        seed=cfg.optim.seed,
        num_shard=jax.process_count(), rank=jax.process_index(),
    )
    dm.setup()

    rng = jax.random.PRNGKey(cfg.optim.seed)
    vae = build_vae(cfg)
    H = cfg.layout.img_height
    vae_params = jax.jit(vae.init)(rng, jnp.zeros((1, H, H, 1)))["params"]
    if args.pretrained_dir:
        vae_params = load_pretrained_torch(
            os.path.join(args.pretrained_dir, PRETRAINED_NAMES["vae"]), vae_params
        )

    model = build_alignment_model(cfg)
    a = cfg.model.align.model_args
    model_params = jax.jit(model.init)(
        rng, jnp.zeros((1,) + tuple(a.input_shape)), jnp.zeros((1,), jnp.int32)
    )["params"]

    mesh = make_data_mesh(cfg.optim.micro_batch_size)
    total_steps = args.max_steps or 30_000
    trainer = AlignmentTrainer(
        model_apply=model.apply,
        vae_apply_encode=lambda v, x: vae.apply(v, x, method=AutoencoderKL.encode_moments),
        vae_params=vae_params,
        timesteps=cfg.model.diffusion.timesteps,
        scale_factor=cfg.model.diffusion.scale_factor,
        optim_config=dict(
            lr=cfg.optim.lr, total_num_steps=total_steps, wd=cfg.optim.wd,
            betas=tuple(cfg.optim.betas),
            gradient_clip_val=cfg.optim.gradient_clip_val,
            warmup_percentage=cfg.optim.warmup_percentage,
        ),
        mesh=mesh,
        prng_impl=cfg.optim.get("prng_impl", "auto"),
        flat_update=cfg.optim.get("flat_update", False),
        pack_small_thr=cfg.optim.get("pack_small_thr", 0),
        matmul_precision=cfg.optim.get("matmul_precision", None),
        conv3d_impl=cfg.optim.get("conv3d_impl", "auto"),
        latent_inputs=args.latents is not None,
    )
    state = trainer.create_state(model_params)
    in_slice, out_slice = layout_to_in_out_slice(
        cfg.layout.layout, cfg.layout.in_len, cfg.layout.out_len
    )
    logger = MetricLogger(
        save_dir, use_wandb=cfg.logging.use_wandb,
        run_name=cfg.logging.logging_prefix, config=cfg.to_dict())
    latent_cache = None
    if args.latents:
        from prediff_tpu.datasets.latents import LatentCache

        latent_cache = LatentCache(args.latents)

    from prediff_tpu.datasets.prefetch import prefetch_to_device
    from prediff_tpu.parallel.mesh import batch_sharding

    def batches(epoch):
        """Producer-thread host pipeline + double-buffered sharded
        device_put (datasets/prefetch.py)."""
        if latent_cache is not None:
            def gen():
                for mom, fm in dm.train_latent_batches(latent_cache, epoch):
                    if mom.shape[0] != cfg.optim.micro_batch_size:
                        continue
                    # target = cached per-frame pixel mean of the OUT window,
                    # (B, T_out, 1) like avg_x_objective — bounded exactly
                    # like out_slice (seq_len may exceed in_len + out_len)
                    t0, t1 = cfg.layout.in_len, cfg.layout.in_len + cfg.layout.out_len
                    yield (mom[out_slice], mom[in_slice], fm[:, t0:t1, None])
        else:
            def gen():
                for b in dm.train_batches(epoch):
                    if b.shape[0] != cfg.optim.micro_batch_size:
                        continue
                    yield b[out_slice], b[in_slice]

        yield from prefetch_to_device(
            gen(), size=2, sharding=batch_sharding(mesh))

    step = 0
    for epoch in range(cfg.optim.max_epochs):
        for args_b in batches(epoch):
            state, metrics = trainer.train_step(state, rng, *args_b)
            step += 1
            if step % 50 == 0:
                logger.log(step, jax.device_get(metrics))
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break
    save_checkpoint(os.path.join(save_dir, "ckpt_align"), state)
    print(f"alignment training done at step {step}; "
          f"relative_mae={float(metrics['relative_mae']):.4f}")


if __name__ == "__main__":
    main()
