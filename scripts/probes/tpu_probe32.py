"""Round-2 probe: re-measure the BASELINE.md suite with the round-2 kernels
(t2d convs + fused FFN + v4 attention, the TPU-default configuration).

1. full chain B=1 (bench headline)     4. guided (PreDiff-KA) sampling B=1
2. ensemble B=8 chain                  5. DDIM-50 forecast latency
3. train step B=2 / B=8 (XLA path by design)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=True)
M = 100


def timeit(tag, fn, n_iter=3, per=1.0):
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(fn(0)))
    t0 = time.perf_counter()
    for i in range(n_iter):
        s = float(np.asarray(fn(i + 1)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{tag:22s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} /s)  [chk {s:.4e}]",
          flush=True)
    return dt


y1 = jnp.asarray(np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))
y8 = jnp.asarray(np.random.RandomState(0).rand(8, 7, 128, 128, 1).astype(np.float32))

timeit("chain B=1 (100 DDPM)", lambda s: jnp.sum(ld.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y1, timesteps=M)), per=M)

timeit("chain B=8 (100 DDPM)", lambda s: jnp.sum(ld.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y8, timesteps=M)),
    per=8 * M)

avg = jnp.full((1, 6, 1), 0.1, jnp.float32)
timeit("guided B=1 (100 DDPM)", lambda s: jnp.sum(ld.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y1, timesteps=M,
    use_alignment=True, alignment_kwargs={"avg_x_gt": avg})), per=M)

timeit("DDIM-50 forecast", lambda s: jnp.sum(ld.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y1,
    sampler="ddim", ddim_steps=50)), per=1)

# train step (XLA path: kernels are inference-only by design)
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

tr = DiffusionTrainer(ld, params["vae"])
for B in (2, 8):
    x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
    yb = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
    holder = {"state": tr.create_state(params["unet"])}

    def run_steps(s, holder=holder, x=x, yb=yb):
        # train_step donates the state, so always chain forward
        for j in range(5):  # chain 5 steps so dispatch amortizes
            holder["state"], metrics = tr.train_step(
                holder["state"], jax.random.PRNGKey(s * 7 + j), x, yb
            )
        return metrics["train/loss"]
    timeit(f"train step x5 B={B}", run_steps, per=5 * B)
