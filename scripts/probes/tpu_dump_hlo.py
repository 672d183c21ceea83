"""Dump the optimized HLO of the sampler and inspect the hot fusions."""
import sys, os, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
y = jnp.zeros((1, 7, 128, 128, 1), jnp.float32)

key = (1, False, 50, True, False, 1, 1.0, 1, "ddpm", None, 0.0, False)
fn = ld._build_sample_fn(*key)
lowered = jax.jit(lambda u, v, r, yy: fn(u, v, 0, r, yy)).lower(
    params["unet"], params["vae"], rng, y)
compiled = lowered.compile()
txt = compiled.as_text()
open("/tmp/sampler_hlo.txt", "w").write(txt)
print("HLO chars:", len(txt), flush=True)
for name in ["fusion.7905", "fusion.7880", "fusion.7755", "fusion.7657",
             "select_reduce_fusion.31"]:
    m = re.search(rf"%?{re.escape(name)} = .*", txt)
    if m:
        print("\n====", name)
        print(m.group(0)[:600])
