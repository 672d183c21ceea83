"""Round-4 probe: VAE-GAN train-step throughput at the v1 config.

The reference spends ~12 days training the VAE on 4x A10G
(/root/reference/README.md:109-116); this records our frames/s on one v5e
chip for the same 128x128 single-frame recipe (gen update + disc update
in ONE jitted step; disc_start crossed so both branches run).  Protocol
(CLAUDE.md): warmup case, chained states, fetch-rare (per 16 steps).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prediff_tpu.config import vae_training_default_config  # noqa: E402
from prediff_tpu.factory import build_vae  # noqa: E402
from prediff_tpu.training.vae_trainer import VAETrainer  # noqa: E402
from prediff_tpu.training.losses import NLayerDiscriminator  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

cfg = vae_training_default_config()
vae = build_vae(cfg)
loss_cfg = cfg.model.loss
STEPS = 16


def run_case(tag, B, disc_on, n_groups=3):
    tr = VAETrainer(
        vae=vae,
        disc=NLayerDiscriminator(
            input_nc=loss_cfg.disc_in_channels,
            n_layers=loss_cfg.disc_num_layers,
            use_actnorm=loss_cfg.use_actnorm,
        ),
        disc_start=0 if disc_on else 10**9,
        kl_weight=loss_cfg.kl_weight,
        disc_weight=loss_cfg.disc_weight,
        disc_factor=loss_cfg.disc_factor,
        disc_loss=loss_cfg.disc_loss,
        logvar_init=loss_cfg.logvar_init,
        perceptual_weight=loss_cfg.perceptual_weight,
        optim_config=dict(lr=4.5e-6, total_num_steps=10000, betas=(0.5, 0.9),
                          gradient_clip_val=None,
                          lr_scheduler_mode="constant",
                          warmup_percentage=0.0),
    )
    rng = jax.random.PRNGKey(0)
    gen_state, disc_state, batch_stats = tr.create_states(
        rng, jnp.zeros((1, 128, 128, 1)))
    x = jnp.asarray(
        np.random.RandomState(0).rand(B, 128, 128, 1).astype(np.float32))
    step = tr.train_step
    print(f"compiling {tag}...", flush=True)
    gen_state, disc_state, batch_stats, mets = step(
        gen_state, disc_state, batch_stats, rng, x)
    _ = float(np.asarray(mets["train/total_loss"]))
    t0 = time.perf_counter()
    for g in range(n_groups):
        for _ in range(STEPS):
            gen_state, disc_state, batch_stats, mets = step(
                gen_state, disc_state, batch_stats, rng, x)
        _ = float(np.asarray(mets["train/total_loss"]))
    dt = (time.perf_counter() - t0) / (n_groups * STEPS)
    print(f"{tag:22s}: {dt*1000:7.1f} ms/step  ({B/dt:7.1f} frames/s)",
          flush=True)
    jax.clear_caches()


CASES = {
    "warmup_B8": (8, True),
    "B8_disc_on": (8, True),
    "B32_disc_on": (32, True),
    "B32_disc_off": (32, False),
    "B64_disc_on": (64, True),
}
want = os.environ.get("P72")
for tag, (B, d) in CASES.items():
    if want and tag not in want.split(","):
        continue
    run_case(tag, B, d)
print("probe72 done", flush=True)
