"""Does-it-learn validation: 400 tiny-model diffusion steps on synthetic
data with a noisy 8-step schedule must show a clear loss decline.
(With the default low-noise tiny schedule the eps-prediction floor is ~0.93
by construction -- see CLAUDE.md.)"""
import os
os.environ['JAX_PLATFORMS']='cpu'
os.environ['XLA_FLAGS']=os.environ.get('XLA_FLAGS','')+' --xla_force_host_platform_device_count=8'
import sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_platforms','cpu')
from prediff_tpu.config import load_config, prediff_default_config, deep_merge, ConfigDict
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer
from prediff_tpu.datasets import synthetic_batch_iterator

cfg = load_config(prediff_default_config, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs", "tiny_smoke.yaml"))
cfg.model.diffusion.linear_end = 0.3   # real noise at 8 steps (abar_7 ~ 0.3)
ld, params = build_pipeline(cfg, with_alignment=False)
print("abar:", np.asarray(ld.schedule.alphas_cumprod), flush=True)
trainer = DiffusionTrainer(ld, params["vae"],
    optim_config=dict(lr=2e-3, total_num_steps=400, warmup_percentage=0.02))
state = trainer.create_state(params["unet"])
rng = jax.random.PRNGKey(0)
batches = list(synthetic_batch_iterator(batch_size=4, seq_len=5, H=32, W=32, num_batches=8))
losses = []
for step in range(400):
    b = jnp.asarray(batches[step % len(batches)])
    x, y = b[:, 3:5], b[:, :3]
    state, m = trainer.train_step(state, rng, x, y)
    losses.append(float(m["train/loss_simple"]))
    if step % 50 == 0 or step == 399:
        print(step, "loss_simple", round(losses[-1],4), flush=True)
first, last = np.mean(losses[:20]), np.mean(losses[-20:])
print(f"first20={first:.3f} last20={last:.3f}")
assert last < first * 0.95, "did not learn"
print("LEARNS OK")
