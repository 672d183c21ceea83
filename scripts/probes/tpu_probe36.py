"""Round-2 probe: v4 grid-cell row budget 256 vs 416 (full chain)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.ops import pallas_attention as pa
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

B, M = 1, 100
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))

for rows in (256, 416):
    pa.V4_MAX_ROWS = rows
    cfg = prediff_default_config()
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)

    def run(seed):
        out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed), y,
                        timesteps=M, return_decoded=True)
        return jnp.sum(out)
    print(f"compiling R<={rows}...", flush=True)
    _ = float(np.asarray(run(0)))
    t0 = time.perf_counter()
    for i in range(3):
        s = float(np.asarray(run(i + 1)))
    dt = (time.perf_counter() - t0) / 3 / M
    print(f"R<={rows}: {dt*1e3:6.3f} ms/step ({1/dt:6.1f} steps/s)  [chk {s:.4e}]",
          flush=True)
