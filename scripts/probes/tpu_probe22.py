"""Round-2 probe: re-measure bf16 params+activations vs fp32 AFTER the t2d
conv fix (round-1 measured only +3% when convs dominated; the profile is now
matmul/LN/copy-dominated where bf16 halves memory traffic)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.utils.precision import cast_pytree

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)

B = 1
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))
N = 100


def bench(tag, p, **kw):
    def run(seed):
        return ld.sample(p["unet"], p["vae"], jax.random.PRNGKey(seed), y,
                         timesteps=N, return_decoded=True, **kw)
    print(f"compiling {tag}...", flush=True)
    out = run(0)
    _ = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    for i in range(3):
        out = run(i + 1)
        s = float(np.asarray(out, np.float32).sum())
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag:18s}: {dt*1000:7.1f} ms/chain  {N/dt:6.1f} steps/s  [chk {s:.4e}]",
          flush=True)


bench("fp32", params)
p16 = {"unet": cast_pytree(params["unet"], jnp.bfloat16), "vae": params["vae"]}
bench("bf16", p16, compute_dtype="bfloat16")
