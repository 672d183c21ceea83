#!/usr/bin/env python
"""Train the frame-wise KL-VAE on SEVIR-LR with GAN loss.

Parity with the reference driver (scripts/vae/sevirlr/train_vae_sevirlr.py):
two-optimizer manual optimization (generator: L1+logvar-NLL+KL+adaptive
adversarial; discriminator: hinge), frames drawn as seq_len=1 windows.

Usage:
  python scripts/train_vae_sevirlr.py --save vae0 --cfg configs/vae_sevirlr_v1.yaml
  python scripts/train_vae_sevirlr.py --save smoke --synthetic --max-steps 5
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--save", default="tmp_vae", type=str)
    p.add_argument("--cfg", default=None, type=str)
    p.add_argument("--sevir-dir", default=None, type=str)
    p.add_argument("--synthetic", action="store_true")
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

    from prediff_tpu.config import vae_training_default_config, load_config, save_yaml
    from prediff_tpu.factory import build_vae
    from prediff_tpu.parallel.mesh import make_data_mesh, shard_batch
    from prediff_tpu.training.vae_trainer import VAETrainer
    from prediff_tpu.training.losses import NLayerDiscriminator
    from prediff_tpu.training.loop import MetricLogger
    from prediff_tpu.datasets import SEVIRDataModule, make_synthetic_sevir_lr
    from prediff_tpu.utils.checkpoint import save_checkpoint

    cfg = load_config(vae_training_default_config, args.cfg)
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
    # frames: seq_len=1 windows with stride 1 (ref train_vae_sevirlr.py)
    dm = SEVIRDataModule(
        seq_len=1, stride=1, layout="NTHWC", aug_mode=cfg.dataset.aug_mode,
        dataset_name=cfg.dataset.dataset_name, sevir_dir=sevir_dir,
        train_test_split_date=cfg.dataset.train_test_split_date,
        val_ratio=cfg.dataset.val_ratio,
        batch_size=cfg.optim.micro_batch_size, seed=cfg.optim.seed,
        num_shard=jax.process_count(), rank=jax.process_index(),
    )
    dm.setup()

    vae = build_vae(cfg)
    loss_cfg = cfg.model.loss
    mesh = make_data_mesh(cfg.optim.micro_batch_size)
    total_steps = args.max_steps or 100_000
    trainer = VAETrainer(
        vae=vae,
        disc=NLayerDiscriminator(
            input_nc=loss_cfg.disc_in_channels,
            n_layers=loss_cfg.disc_num_layers,
            use_actnorm=loss_cfg.use_actnorm,
        ),
        disc_start=loss_cfg.disc_start,
        kl_weight=loss_cfg.kl_weight,
        disc_weight=loss_cfg.disc_weight,
        disc_factor=loss_cfg.disc_factor,
        disc_loss=loss_cfg.disc_loss,
        logvar_init=loss_cfg.logvar_init,
        perceptual_weight=loss_cfg.perceptual_weight,
        optim_config=dict(lr=cfg.optim.lr, total_num_steps=total_steps,
                          betas=(0.5, 0.9), gradient_clip_val=None,
                          lr_scheduler_mode="constant", warmup_percentage=0.0),
        mesh=mesh,
        flat_update=cfg.optim.get("flat_update", False),
        pack_small_thr=cfg.optim.get("pack_small_thr", 0),
        compute_dtype=cfg.optim.get("vae_compute_dtype", None),
    )
    rng = jax.random.PRNGKey(cfg.optim.seed)
    H = cfg.layout.img_height
    gen_state, disc_state, batch_stats = trainer.create_states(
        rng, jnp.zeros((1, H, H, cfg.model.vae.in_channels))
    )
    logger = MetricLogger(
        save_dir, use_wandb=cfg.logging.use_wandb,
        run_name=cfg.logging.logging_prefix, config=cfg.to_dict())
    from prediff_tpu.datasets.prefetch import prefetch_to_device
    from prediff_tpu.parallel.mesh import batch_sharding

    def frame_batches(epoch):
        """Producer-thread host pipeline + double-buffered sharded
        device_put (datasets/prefetch.py)."""
        def gen():
            for b in dm.train_batches(epoch):
                if b.shape[0] != cfg.optim.micro_batch_size:
                    continue
                yield b[:, 0]  # (B, H, W, C)

        yield from prefetch_to_device(
            gen(), size=2, sharding=batch_sharding(mesh))

    step = 0
    for epoch in range(cfg.optim.max_epochs):
        for frames in frame_batches(epoch):
            gen_state, disc_state, batch_stats, logs = trainer.train_step(
                gen_state, disc_state, batch_stats, rng, frames
            )
            step += 1
            if step % 50 == 0:
                logger.log(step, jax.device_get(logs))
            if args.max_steps and step >= args.max_steps:
                break
        if args.max_steps and step >= args.max_steps:
            break
    save_checkpoint(os.path.join(save_dir, "ckpt_vae"), gen_state)
    print(f"VAE training done at step {step}; nll="
          f"{float(logs['train/nll_loss']):.4f}")


if __name__ == "__main__":
    main()
