"""Pallas fused attention vs einsum path in the full sampler (TPU)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config, load_config, deep_merge, ConfigDict
from prediff_tpu.factory import build_pipeline

N_STEPS = 50

def bench(use_pallas, B=1):
    cfg = prediff_default_config()
    cfg.model.latent_model["use_pallas_attention"] = use_pallas
    rng = jax.random.PRNGKey(0)
    ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
    y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))
    out = ld.sample(params["unet"], params["vae"], rng, y, timesteps=N_STEPS)
    ref_sum = float(np.asarray(out).sum())
    t0 = time.perf_counter()
    n = 2
    for i in range(n):
        out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(i + 1), y,
                        timesteps=N_STEPS)
        _ = float(np.asarray(out).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"pallas={use_pallas} B={B}: {dt*1000:.0f} ms -> {N_STEPS/dt:.0f} steps/s "
          f"(warm sum {ref_sum:.4e})", flush=True)

bench(False)
bench(True)
