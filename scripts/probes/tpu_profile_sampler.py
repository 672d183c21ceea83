"""Attempt a jax.profiler trace of one sampler call on the axon backend."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.utils.profiling import trace

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
y = jnp.asarray(np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))
out = ld.sample(params["unet"], params["vae"], rng, y, timesteps=50)
_ = float(np.asarray(out).sum())
print("warmed", flush=True)
with trace("/tmp/jax-trace"):
    out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(1), y, timesteps=50)
    _ = float(np.asarray(out).sum())
print("traced", flush=True)
import glob
for f in glob.glob("/tmp/jax-trace/**/*", recursive=True):
    print(f, os.path.getsize(f) if os.path.isfile(f) else "dir", flush=True)
