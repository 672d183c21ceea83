"""Round-2 probe: full sampling chain with the fused Pallas FFN on vs off."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

B = 1
N = 100
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))


def bench(tag, use_pallas_ffn):
    cfg = prediff_default_config()
    cfg.model.latent_model.use_pallas_ffn = use_pallas_ffn
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)

    def run(seed):
        return ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed), y,
                         timesteps=N, return_decoded=True)
    print(f"compiling {tag}...", flush=True)
    out = run(0)
    _ = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    for i in range(3):
        out = run(i + 1)
        s = float(np.asarray(out, np.float32).sum())
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag:12s}: {dt*1000:7.1f} ms/chain  {N/dt:6.1f} steps/s  [chk {s:.4e}]",
          flush=True)


bench("xla-ffn", False)
bench("pallas-ffn", True)
