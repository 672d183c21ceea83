"""Throughput levers: batch size and bf16 params/activations (idle host,
host-materialized timing)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
N_STEPS = 50

def bench_sampler(B, param_dtype, tag):
    p = params
    if param_dtype == jnp.bfloat16:
        p = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
    y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1)).astype(
        jnp.float32 if param_dtype == jnp.float32 else jnp.bfloat16)
    out = ld.sample(p["unet"], p["vae"], rng, y, timesteps=N_STEPS)
    _ = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    n = 2
    for i in range(n):
        out = ld.sample(p["unet"], p["vae"], jax.random.PRNGKey(i + 1), y,
                        timesteps=N_STEPS)
        _ = float(np.asarray(out, np.float32).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1000:.0f} ms/forecast -> "
          f"{N_STEPS/dt:.0f} steps/s, {B*N_STEPS/dt:.0f} sample-steps/s",
          flush=True)

bench_sampler(1, jnp.float32, "B=1 fp32")
bench_sampler(8, jnp.float32, "B=8 fp32")
bench_sampler(8, jnp.bfloat16, "B=8 bf16")
bench_sampler(1, jnp.bfloat16, "B=1 bf16")
