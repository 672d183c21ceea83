"""Round-2 probe: FFN kernel token-tile budget (4MB default vs 2MB/8MB caps
-> stage-1 tiles 832 vs 416 vs 1664) on the full chain."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.ops import pallas_ffn as pf
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

B, M = 1, 100
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))
orig = pf.pick_token_tile

for mb in (2, 4, 8):
    cap = mb * 1024 * 1024
    pf.pick_token_tile = lambda t, h, max_bytes=cap: orig(t, h, max_bytes)
    cfg = prediff_default_config()
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
    tiles = (orig(3328, 1024, cap), orig(832, 2048, cap))

    def run(seed):
        out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed), y,
                        timesteps=M, return_decoded=True)
        return jnp.sum(out)
    print(f"compiling cap={mb}MB tiles={tiles}...", flush=True)
    _ = float(np.asarray(run(0)))
    t0 = time.perf_counter()
    for i in range(3):
        s = float(np.asarray(run(i + 1)))
    dt = (time.perf_counter() - t0) / 3 / M
    print(f"cap={mb}MB: {dt*1e3:6.3f} ms/step ({1/dt:6.1f} steps/s)  [chk {s:.4e}]",
          flush=True)
