"""Confirm while-loop per-iteration overhead; test scan unrolling."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline, build_unet

def timeit(fn, n=3):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

# 1) trivial-body scan: measures pure while-loop iteration overhead
z0 = jnp.ones((1, 6, 16, 16, 64))

@jax.jit
def trivial_scan(z):
    def body(z, t):
        return z * 0.9999 + 1e-6, None
    z, _ = jax.lax.scan(body, z, jnp.arange(100, dtype=jnp.int32))
    return z

dt = timeit(lambda: trivial_scan(z0))
print(f"trivial scan 100:        {dt*1000:.2f} ms")

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
unet = build_unet(cfg)
params = jax.jit(unet.init)(rng, z0, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 7, 16, 16, 64)))["params"]

@jax.jit
def perturb(p, key):
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])

up = perturb(params, rng)
zc = jnp.asarray(np.random.RandomState(1).randn(1, 7, 16, 16, 64).astype(np.float32))

def make_scan(n_steps, unroll):
    @jax.jit
    def scan_fn(p, z, zc):
        def body(z, t):
            out = unet.apply({"params": p}, z, jnp.full((1,), t, jnp.int32), zc)
            return z * 0.999 + 0.01 * out, None
        z, _ = jax.lax.scan(body, z, jnp.arange(n_steps, dtype=jnp.int32),
                            unroll=unroll)
        return z
    return scan_fn

for unroll in (5, 25):
    fn = make_scan(100, unroll)
    dt = timeit(lambda: fn(up, z0, zc))
    print(f"unet scan 100 unroll={unroll:3d}: {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")
