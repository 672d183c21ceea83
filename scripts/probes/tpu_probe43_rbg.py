"""Round-3 probe D: threefry vs TPU-hardware-RNG ('rbg') per-step randomness.

probe40c showed dropout-0 trains 25-50% faster than the v1 dropout-0.1
config — the suspect is threefry mask/noise generation.  Measure the v1
train step with prng_impl None (threefry) vs 'rbg' at B=2 and B=8.
"""
import sys, os, time, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

print("backend:", jax.default_backend(), flush=True)


def timeit(tag, fn, n_iter=3, per=1.0):
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(fn(0)))
    t0 = time.perf_counter()
    for i in range(n_iter):
        s = float(np.asarray(fn(i + 1)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{tag:30s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} /s)  [chk {s:.4e}]",
          flush=True)
    return dt


cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
for impl in (None, "rbg"):
    for B in (2, 8):
        tr = DiffusionTrainer(ld, params["vae"], prng_impl=impl)
        x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
        y = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
        holder = {"state": tr.create_state(params["unet"])}

        def run(s, holder=holder, tr=tr, x=x, y=y):
            for j in range(5):
                holder["state"], metrics = tr.train_step(
                    holder["state"], jax.random.PRNGKey(s * 7 + j), x, y)
            return metrics["train/loss"]
        timeit(f"train v1 impl={impl} x5 B={B}", run, per=5 * B)
        del holder, tr, run, x, y
        jax.clear_caches()
        gc.collect()
print("probe43 done", flush=True)
