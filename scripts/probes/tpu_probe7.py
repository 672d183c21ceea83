"""Honest timing: chained inputs + host materialization (np.asarray) so the
relay cannot hide async work."""
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
z_shape = (1, 6, 16, 16, 64)

@jax.jit
def perturb(p, key):
    leaves, treedef = jax.tree_util.tree_flatten(p)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [l + 0.01 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)])

up = perturb(params["unet"], rng)
zc = jnp.asarray(np.random.RandomState(1).randn(1, 7, 16, 16, 64).astype(np.float32))
z0 = jnp.asarray(np.random.RandomState(2).randn(*z_shape).astype(np.float32))

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

def timeit_host(fn, z_init, n=3):
    z = fn(up, z_init, zc)
    _ = float(jnp.sum(z))  # warm + materialize
    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(n):
        z = fn(up, z * 0.5, zc)
        acc += float(np.asarray(z).sum())  # forces full host fetch per call
    dt = (time.perf_counter() - t0) / n
    return dt, acc

for unroll in (1, 5):
    fn = make_scan(100, unroll)
    dt, acc = timeit_host(fn, z0)
    print(f"HOST unet scan 100 unroll={unroll}: {dt*1000:.1f} ms -> "
          f"{100/dt:.0f} steps/s (acc={acc:.3e})")

# full sampler, host-materialized, chained rng
y = jnp.asarray(np.random.RandomState(3).rand(1, 7, 128, 128, 1).astype(np.float32))
out = ld.sample(params["unet"], params["vae"], rng, y, timesteps=100)
_ = float(jnp.sum(out))
t0 = time.perf_counter()
n = 3
for i in range(n):
    out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(i + 1), y,
                    timesteps=100)
    _ = float(np.asarray(out).sum())
dt = (time.perf_counter() - t0) / n
print(f"HOST sampler 100 (ddpm): {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")
