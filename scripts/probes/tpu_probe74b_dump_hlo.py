"""Dump the optimized HLO of the VAE train step to a file for inspection
(probe74's regex found zero convolutions — check the actual text format)."""
import os
import sys

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
B = 32
cfg = vae_training_default_config()
vae = build_vae(cfg)
lc = cfg.model.loss
tr = VAETrainer(
    vae=vae,
    disc=NLayerDiscriminator(input_nc=lc.disc_in_channels,
                             n_layers=lc.disc_num_layers,
                             use_actnorm=lc.use_actnorm),
    disc_start=0, kl_weight=lc.kl_weight, disc_weight=lc.disc_weight,
    disc_factor=lc.disc_factor, disc_loss=lc.disc_loss,
    logvar_init=lc.logvar_init, perceptual_weight=lc.perceptual_weight,
    optim_config=dict(lr=4.5e-6, total_num_steps=10000, betas=(0.5, 0.9),
                      gradient_clip_val=None, lr_scheduler_mode="constant",
                      warmup_percentage=0.0),
)
rng = jax.random.PRNGKey(0)
gs, ds, bs = tr.create_states(rng, jnp.zeros((1, 128, 128, 1)))
x = jnp.asarray(np.random.RandomState(0).rand(B, 128, 128, 1)
                .astype(np.float32))
print("compiling...", flush=True)
text = jax.jit(tr.make_train_step()).lower(gs, ds, bs, rng, x).compile().as_text()
with open("/tmp/vae_train_hlo.txt", "w") as f:
    f.write(text)
print(f"wrote {len(text)} chars", flush=True)
import re  # noqa: E402
for kw in ("convolution", "custom-call", "conv"):
    n = len(re.findall(kw, text))
    print(f"count '{kw}': {n}", flush=True)
