"""Cache-proof timing: vary inputs per call, chain outputs."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_unet

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
unet = build_unet(cfg)
z_shape = (1, 6, 16, 16, 64)
params = jax.jit(unet.init)(rng, jnp.zeros(z_shape), jnp.zeros((1,), jnp.int32),
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

def timeit_chained(fn, z_init, n=4):
    """Chain outputs into inputs so no two calls see the same args."""
    z = fn(up, z_init, zc)  # warm/compile
    jax.block_until_ready(z)
    t0 = time.perf_counter()
    for _ in range(n):
        z = fn(up, z * 0.5, zc)
    jax.block_until_ready(z)
    return (time.perf_counter() - t0) / n

z0 = jnp.asarray(np.random.RandomState(2).randn(*z_shape).astype(np.float32))
for unroll in (1, 5):
    fn = make_scan(100, unroll)
    dt = timeit_chained(fn, z0)
    print(f"CHAINED unet scan 100 unroll={unroll}: {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")
