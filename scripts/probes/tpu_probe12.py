"""True bf16 activations + bf16 params in the sampler (idle host)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.utils.precision import cast_to_bf16

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
N_STEPS = 50
B = 1
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))


def bench(p, dtype, tag):
    out = ld.sample(p["unet"], p["vae"], rng, y, timesteps=N_STEPS,
                    compute_dtype=dtype)
    warm = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        out = ld.sample(p["unet"], p["vae"], jax.random.PRNGKey(i + 1), y,
                        timesteps=N_STEPS, compute_dtype=dtype)
        _ = float(np.asarray(out, np.float32).sum())
    dt = (time.perf_counter() - t0) / n
    print(f"{tag}: {dt*1000:.0f} ms -> {N_STEPS/dt:.0f} steps/s (warm {warm:.4e})",
          flush=True)


bench(params, "float32", "fp32 params, fp32 act")
bf16_params = jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
bench(bf16_params, "bfloat16", "bf16 params, bf16 act")
