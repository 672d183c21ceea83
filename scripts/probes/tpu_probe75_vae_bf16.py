"""Round-4 probe: VAE-GAN train step f32 vs bf16 compute_dtype A/B.

probe73 profiled the B=32 step at 176.5 ms device with decoder backward
dominating and conv MFU 52% fwd / 38% bwd of bf16 peak.  probe74b's HLO
dump shows XLA already demotes SOME conv inputs to bf16 (excess-precision
pass) but stores every activation/output f32 — so explicit bf16
params+activations (VAETrainer compute_dtype='bfloat16') halves the HBM
traffic of the conv stacks.  Protocol (CLAUDE.md): warmup case first,
chained states, fetch once per 16 steps, compare within one process.
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


def run_case(tag, B, compute_dtype, n_groups=3):
    tr = VAETrainer(
        vae=vae,
        disc=NLayerDiscriminator(
            input_nc=loss_cfg.disc_in_channels,
            n_layers=loss_cfg.disc_num_layers,
            use_actnorm=loss_cfg.use_actnorm,
        ),
        disc_start=0,
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
        compute_dtype=compute_dtype,
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
    loss0 = float(np.asarray(mets["train/total_loss"]))
    t0 = time.perf_counter()
    for g in range(n_groups):
        for _ in range(STEPS):
            gen_state, disc_state, batch_stats, mets = step(
                gen_state, disc_state, batch_stats, rng, x)
        _ = float(np.asarray(mets["train/total_loss"]))
    dt = (time.perf_counter() - t0) / (n_groups * STEPS)
    print(f"{tag:22s}: {dt*1000:7.1f} ms/step  ({B/dt:7.1f} frames/s)"
          f"  first-step loss {loss0:.4f}", flush=True)
    jax.clear_caches()


CASES = {
    "warmup_B32_bf16": (32, "bfloat16"),
    "B32_f32": (32, None),
    "B32_bf16": (32, "bfloat16"),
    "B64_bf16": (64, "bfloat16"),
    "B8_bf16": (8, "bfloat16"),
}
want = os.environ.get("P75")
for tag, (B, cd) in CASES.items():
    if want and tag not in want.split(","):
        continue
    run_case(tag, B, cd)
print("probe75 done", flush=True)
