"""Round-5 probe: whole-step A/B of the sub-pixel decoder upsampler
(``decoder_subpixel``, ops/subpixel.py) on the VAE-GAN train step and on
decode-only inference.

probe79 measured the isolated up2 upsampler at +37% fwd / +27% grad
(v_shift); isolated-layer wins do not always transfer (CLAUDE.md round-3
lesson), so this drives the probe72 protocol end-to-end: warmup case
first, chained states, fetch once per 16 steps, f32 anchor re-run last to
detect relay-regime shifts.  Cases cover f32 and the opt-in bf16 compute
mode (probe75's +4.6%).

    python scripts/probes/tpu_probe80_subpixel_train_ab.py
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
from prediff_tpu.models.vae import AutoencoderKL  # noqa: E402
from prediff_tpu.training.vae_trainer import VAETrainer  # noqa: E402
from prediff_tpu.training.losses import NLayerDiscriminator  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

B = int(os.environ.get("P80_B", "32"))
STEPS = 16
N_GROUPS = int(os.environ.get("P80_GROUPS", "3"))

cfg = vae_training_default_config()
loss_cfg = cfg.model.loss


def make_trainer(subpixel, compute_dtype):
    cfg.model.vae.decoder_subpixel = subpixel
    vae = build_vae(cfg)
    return VAETrainer(
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
        compute_dtype=compute_dtype,
        optim_config=dict(lr=4.5e-6, total_num_steps=10000, betas=(0.5, 0.9),
                          gradient_clip_val=None,
                          lr_scheduler_mode="constant",
                          warmup_percentage=0.0),
    )


def run_train_case(tag, subpixel, compute_dtype, b=B):
    tr = make_trainer(subpixel, compute_dtype)
    rng = jax.random.PRNGKey(0)
    gen_state, disc_state, batch_stats = tr.create_states(
        rng, jnp.zeros((1, 128, 128, 1)))
    x = jnp.asarray(
        np.random.RandomState(0).rand(b, 128, 128, 1).astype(np.float32))
    step = tr.train_step
    print(f"compiling {tag}...", flush=True)
    gen_state, disc_state, batch_stats, mets = step(
        gen_state, disc_state, batch_stats, rng, x)
    loss0 = float(np.asarray(mets["train/total_loss"]))
    t0 = time.perf_counter()
    for _ in range(N_GROUPS):
        for _ in range(STEPS):
            gen_state, disc_state, batch_stats, mets = step(
                gen_state, disc_state, batch_stats, rng, x)
        _ = float(np.asarray(mets["train/total_loss"]))
    dt = (time.perf_counter() - t0) / (N_GROUPS * STEPS)
    print(f"{tag:24s}: {dt*1000:7.1f} ms/step  ({b/dt:7.1f} frames/s)  "
          f"first-step loss {loss0:.6f}", flush=True)
    jax.clear_caches()
    return dt, loss0


def run_decode_case(tag, subpixel, b=6):
    """Decode-only inference (the forecast path; known-real 27.7 ms/6fr)."""
    cfg.model.vae.decoder_subpixel = subpixel
    vae = build_vae(cfg)
    variables = jax.jit(vae.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 128, 128, 1)))
    z = jnp.asarray(np.random.RandomState(1).rand(b, 16, 16, 64)
                    .astype(np.float32))

    @jax.jit
    def dec(v, z):
        return jnp.sum(vae.apply(v, z, method=AutoencoderKL.decode)
                       .astype(jnp.float32))

    out = float(np.asarray(dec(variables, z)))  # compile+warmup
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out = float(np.asarray(dec(variables, z)))
    dt = (time.perf_counter() - t0) / n
    print(f"{tag:24s}: {dt*1000:7.2f} ms/decode({b}fr)  sum {out:.4f}",
          flush=True)
    jax.clear_caches()


# warmup case eats the one-time staging cost (CLAUDE.md rule 4)
run_train_case("warmup", False, None, b=8)
run_train_case("base_f32", False, None)
run_train_case("subpixel_f32", True, None)
run_train_case("base_bf16", False, "bfloat16")
run_train_case("subpixel_bf16", True, "bfloat16")
run_train_case("base_f32_anchor", False, None)
run_decode_case("decode_base", False)
run_decode_case("decode_subpixel", True)
print("probe80 done", flush=True)
