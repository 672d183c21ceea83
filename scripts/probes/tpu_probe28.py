"""Round-2 probe: sampler RNG cost — threefry (jax default) vs TPU rbg keys.

probe27: bare forward 6.74 ms/step vs sampler 7.79; ~0.45 is VAE amortized,
leaving ~0.6 ms/step of sampler arithmetic, dominated by threefry normal()
per step.  rbg uses the TPU hardware RNG instruction.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)

B, M = 1, 100
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))


def bench(tag, make_key):
    def run(seed):
        return ld.sample(params["unet"], params["vae"], make_key(seed), y,
                         timesteps=M, return_decoded=True)
    print(f"compiling {tag}...", flush=True)
    out = run(0)
    _ = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    for i in range(3):
        out = run(i + 1)
        s = float(np.asarray(out, np.float32).sum())
    dt = (time.perf_counter() - t0) / 3 / M
    print(f"{tag:9s}: {dt*1e3:6.3f} ms/step ({1/dt:6.1f} steps/s)  [chk {s:.4e}]",
          flush=True)


bench("threefry", lambda s: jax.random.PRNGKey(s))
bench("rbg", lambda s: jax.random.key(s, impl="rbg"))
