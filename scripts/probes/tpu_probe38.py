"""Round-2 probe: FFN kernel GELU computed in bf16 vs f32 (full chain)."""
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
orig_act = pf._apply_activation

for tag, bf16 in [("gelu-f32", False), ("gelu-bf16", True)]:
    if bf16:
        pf._apply_activation = lambda h, a: orig_act(
            h.astype(jnp.bfloat16), a
        ).astype(jnp.float32)
    else:
        pf._apply_activation = orig_act
    cfg = prediff_default_config()
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)

    def run(seed):
        out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed), y,
                        timesteps=M, return_decoded=True)
        return jnp.sum(out)
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(run(0)))
    t0 = time.perf_counter()
    for i in range(3):
        s = float(np.asarray(run(i + 1)))
    dt = (time.perf_counter() - t0) / 3 / M
    print(f"{tag:10s}: {dt*1e3:6.3f} ms/step ({1/dt:6.1f} steps/s)  [chk {s:.4e}]",
          flush=True)
pf._apply_activation = orig_act
