"""Training-step throughput on the real chip (v1 config, frozen VAE)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 2  # v1 micro_batch_size=2

trainer = DiffusionTrainer(
    ld, params["vae"],
    optim_config=dict(lr=1e-3, total_num_steps=10_000),
    use_ema=True,
)
state = trainer.create_state(params["unet"])
x = jnp.asarray(np.random.RandomState(0).rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(np.random.RandomState(1).rand(B, 7, 128, 128, 1).astype(np.float32))

state, m = trainer.train_step(state, rng, x, y)  # compile
_ = float(m["train/loss"])
t0 = time.perf_counter()
n = 10
for _i in range(n):
    state, m = trainer.train_step(state, rng, x, y)
    _ = float(m["train/loss"])
dt = (time.perf_counter() - t0) / n
print(f"train step B={B}: {dt*1000:.0f} ms -> {1/dt:.2f} steps/s, "
      f"{B/dt:.2f} samples/s", flush=True)
