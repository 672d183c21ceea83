import time
import numpy as np

t00 = time.perf_counter()
import jax
import jax.numpy as jnp
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_unet

print("import", time.perf_counter() - t00, jax.devices())
cfg = prediff_default_config()
unet = build_unet(cfg)
rng = jax.random.PRNGKey(0)
B = 1
x = jnp.zeros((B, 6, 16, 16, 64))
t = jnp.zeros((B,), jnp.int32)
c = jnp.zeros((B, 7, 16, 16, 64))
t0 = time.perf_counter()
params = unet.init(rng, x, t, c)["params"]
print("init", time.perf_counter() - t0)
f = jax.jit(lambda p, x, t, c: unet.apply({"params": p}, x, t, c))
t0 = time.perf_counter()
out = f(params, x, t, c)
out.block_until_ready()
print("compile+first run", time.perf_counter() - t0)
t0 = time.perf_counter()
for _ in range(20):
    out = f(params, x, t, c)
out.block_until_ready()
dt = (time.perf_counter() - t0) / 20
print("per-step", dt, "steps/s", 1 / dt)
