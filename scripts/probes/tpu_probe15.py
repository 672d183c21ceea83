"""Round-2 probe: op-level profile of ONE bare UNet forward at B=1.

probe13 showed the forward itself is ~12.6 ms (chained dispatches == scan ==
scan+rng), so the tail lives inside the forward.  Trace it and parse the
xplane with xprof to rank ops by self time.
"""
import sys, os, glob
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)

B = 1
z = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))
t_b = jnp.zeros((B,), jnp.int32)

fwd = jax.jit(lambda p, z, t, c: ld.unet_apply({"params": p}, z, t, c))
out = fwd(params["unet"], z, t_b, zc)
print("warm", float(np.asarray(out).sum()), flush=True)

trace_dir = "/tmp/jax-trace-fwd"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(20):
    out = fwd(params["unet"], out, t_b, zc)
_ = float(np.asarray(out).sum())
jax.profiler.stop_trace()
print("traced", flush=True)
for f in glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True):
    print(f, os.path.getsize(f), flush=True)
