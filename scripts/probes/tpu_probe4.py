"""Scan scaling + correctness on the axon TPU backend."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline, build_unet

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
unet = build_unet(cfg)

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
    return (time.perf_counter() - t0) / n, out

def make_scan(n_steps):
    @jax.jit
    def scan_fn(p, z, zc):
        def body(z, t):
            out = unet.apply({"params": p}, z, jnp.full((B,), t, jnp.int32), zc)
            return z * 0.999 + 0.01 * out, None
        z, _ = jax.lax.scan(body, z, jnp.arange(n_steps, dtype=jnp.int32))
        return z
    return scan_fn

f1 = jax.jit(lambda p, z, zc, t: unet.apply({"params": p}, z, t, zc))

# correctness: 5-step scan vs 5-step dispatch loop
scan5 = make_scan(5)
dt, z_scan = timeit(lambda: scan5(up, z0, zc), n=1)
z_loop = z0
for i in range(5):
    out = f1(up, z_loop, zc, jnp.full((B,), i, jnp.int32))
    z_loop = z_loop * 0.999 + 0.01 * out
err = float(jnp.abs(z_scan - z_loop).max())
print(f"scan vs loop max abs err (5 steps): {err:.2e}")

# scaling: 100 vs 400 steps
for n in (100, 400):
    fn = make_scan(n)
    dt, _ = timeit(lambda: fn(up, z0, zc))
    print(f"scan {n}: {dt*1000:.1f} ms -> {n/dt:.0f} steps/s")

# sampler scaling: 100 vs 200
for n in (100, 200):
    dt, _ = timeit(lambda: ld.sample(params["unet"], params["vae"], rng,
                                     jnp.zeros((B, 7, 128, 128, 1)),
                                     timesteps=n, return_decoded=False))
    print(f"sampler {n}: {dt*1000:.1f} ms -> {n/dt:.0f} steps/s")
