"""Isolate sampling-chain cost: scan-of-UNet vs full sampler vs VAE codec."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline, build_unet

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
B = 1
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))

def timeit(fn, n=3, warm=1):
    for _ in range(warm):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n

# 1) bare scan of UNet steps (no p_mean_variance, no noise)
unet = build_unet(cfg)
zc = jnp.zeros((B, 7, 16, 16, 64))
z0 = jnp.zeros((B, 6, 16, 16, 64))

@jax.jit
def bare_scan(p, z, zc):
    def body(z, t):
        out = unet.apply({"params": p}, z, jnp.full((B,), t, jnp.int32), zc)
        return z + 0.001 * out, None
    z, _ = jax.lax.scan(body, z, jnp.arange(100, dtype=jnp.int32))
    return z

dt = timeit(lambda: bare_scan(params["unet"], z0, zc))
print(f"bare 100-step UNet scan: {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")

# 2) full sampler latent-only (includes VAE encode of cond, not decode)
dt = timeit(lambda: ld.sample(params["unet"], params["vae"], rng, y,
                              timesteps=100, return_decoded=False))
print(f"sampler latent-only:     {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")

# 3) full sampler with decode
dt = timeit(lambda: ld.sample(params["unet"], params["vae"], rng, y,
                              timesteps=100, return_decoded=True))
print(f"sampler + decode:        {dt*1000:.1f} ms -> {100/dt:.0f} steps/s")

# 4) VAE encode / decode alone
@jax.jit
def enc(vp, y):
    return ld.encode_first_stage(vp, y)

@jax.jit
def dec(vp, z):
    return ld.decode_first_stage(vp, z)

z = enc(params["vae"], y)
dt = timeit(lambda: enc(params["vae"], y))
print(f"VAE encode 7 frames:     {dt*1000:.1f} ms")
dt = timeit(lambda: dec(params["vae"], z[:, :6]))
print(f"VAE decode 6 frames:     {dt*1000:.1f} ms")
