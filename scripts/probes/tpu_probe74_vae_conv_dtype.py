"""Round-4 probe: what dtype do the VAE-GAN train step's convolutions run
at on the MXU?

probe73 read conv MFU as 52% fwd / 38% bwd "of bf16 peak" — but if XLA is
actually executing those convs in f32 (v5e f32 MXU rate is ~1/2 the bf16
rate), the backward is ALREADY ~76% of the f32 roofline and the real lever
is precision (explicit bf16 conv inputs), not a custom kernel.  This probe
compiles the train step and tabulates every convolution fusion's
operand/output dtypes and shapes from the optimized HLO.
"""
import os
import re
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
hlo = jax.jit(tr.make_train_step()).lower(gs, ds, bs, rng, x).compile()
text = hlo.as_text()

# Every convolution instruction: "%conv.N = TYPE[shape]{layout} convolution(
#   TYPE[shape] %a, TYPE[shape] %b), window=..."
pat = re.compile(
    r"(\w+)\s*=\s*(\w+)\[([\d,]*)\][^=\n]*convolution\(\s*"
    r"(\w+)\[([\d,]*)\][^,]*,\s*(\w+)\[([\d,]*)\]", re.S)
rows = {}
for m in pat.finditer(text):
    name, odt, osh, adt, ash, bdt, bsh = m.groups()
    key = (odt, adt, bdt, ash, bsh, osh)
    rows[key] = rows.get(key, 0) + 1

print(f"\n{sum(rows.values())} convolution ops, "
      f"{len(rows)} distinct (out<-in,kern) signatures:\n", flush=True)


def flops(ash, bsh, osh):
    # conservative: 2 * prod(out spatial+batch) * prod(kernel) — exact
    # enough for ranking.  shapes are comma strings.
    a = [int(v) for v in ash.split(",") if v]
    b = [int(v) for v in bsh.split(",") if v]
    o = [int(v) for v in osh.split(",") if v]
    return 2 * int(np.prod(o)) * int(np.prod(b)) // max(o[-1], 1)


for (odt, adt, bdt, ash, bsh, osh), n in sorted(
        rows.items(), key=lambda kv: -flops(*kv[0][3:]) * kv[1]):
    gf = flops(ash, bsh, osh) * n / 1e9
    print(f"  x{n:2d} {adt}[{ash}] * {bdt}[{bsh}] -> {odt}[{osh}]"
          f"  ~{gf:8.1f} GF", flush=True)

f32 = sum(n for (odt, adt, bdt, *_), n in rows.items()
          if "f32" in (adt, bdt) and "bf16" not in (adt, bdt))
bf = sum(n for (odt, adt, bdt, *_), n in rows.items()
         if adt == "bf16" and bdt == "bf16")
print(f"\nsummary: {bf} pure-bf16 convs, {f32} f32 convs, "
      f"{sum(rows.values()) - bf - f32} mixed", flush=True)
