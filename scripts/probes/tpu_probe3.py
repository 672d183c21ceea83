"""Isolate: non-elided UNet scan vs p_sample scan vs RNG cost."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline, build_unet
from prediff_tpu.diffusion import core

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
unet = build_unet(cfg)

# perturb params so nothing is constant-foldable / elided
@jax.jit
def perturb(p, key):
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.01 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)],
    )

up = perturb(params["unet"], rng)
B = 1
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))
z0 = jnp.asarray(np.random.RandomState(2).randn(B, 6, 16, 16, 64).astype(np.float32))

def timeit(fn, n=3):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

# 0) single forward x100 sequential dispatches
f1 = jax.jit(lambda p, z, zc: unet.apply({"params": p}, z, jnp.zeros((B,), jnp.int32), zc))
def hundred():
    z = z0
    for i in range(100):
        z = f1(up, z, zc)
    return z
dt = timeit(hundred, n=1)
print(f"100 sequential forwards (dispatch loop): {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")

# 1) scan of bare UNet
@jax.jit
def bare_scan(p, z, zc):
    def body(z, t):
        out = unet.apply({"params": p}, z, jnp.full((B,), t, jnp.int32), zc)
        return z * 0.999 + 0.01 * out, None
    z, _ = jax.lax.scan(body, z, jnp.arange(100, dtype=jnp.int32))
    return z
dt = timeit(lambda: bare_scan(up, z0, zc))
print(f"scan 100 bare UNet:      {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")

# 2) scan of UNet + schedule math (no RNG)
sch = ld.schedule
@jax.jit
def sched_scan(p, z, zc):
    def body(z, t):
        tb = jnp.full((B,), t, jnp.int32)
        out = unet.apply({"params": p}, z, tb, zc)
        mean, _, logv, _ = core.p_mean_variance(sch, out, z, tb)
        return mean, None
    z, _ = jax.lax.scan(body, z, jnp.arange(99, -1, -1, dtype=jnp.int32))
    return z
dt = timeit(lambda: sched_scan(up, z0, zc))
print(f"scan 100 +sched math:    {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")

# 3) scan of UNet + schedule + per-step RNG normal
@jax.jit
def rng_scan(p, z, zc, key):
    def body(z, t):
        tb = jnp.full((B,), t, jnp.int32)
        out = unet.apply({"params": p}, z, tb, zc)
        mean, _, logv, _ = core.p_mean_variance(sch, out, z, tb)
        noise = jax.random.normal(jax.random.fold_in(key, t), z.shape, z.dtype)
        nz = (t > 0).astype(z.dtype)
        return mean + nz * jnp.exp(0.5 * logv) * noise, None
    z, _ = jax.lax.scan(body, z, jnp.arange(99, -1, -1, dtype=jnp.int32))
    return z
dt = timeit(lambda: rng_scan(up, z0, zc, rng))
print(f"scan 100 +rng noise:     {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")
