"""Round-2 probe: step decomposition with the fused FFN on.

(a) bare UNet forward in an N-step scan (scalar fetch)
(b) full DDPM sampler chain (includes VAE enc/dec + posterior arithmetic+RNG)
The difference bounds what sampler-arithmetic fusion could still win.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)

B = 1
N = 500
z0 = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))
t_b = jnp.zeros((B,), jnp.int32)


@jax.jit
def fwd_loop(p, z, seed, c):
    z = z * (1.0 + 1e-6 * seed)
    def body(carry, _):
        o = ld.unet_apply({"params": p}, carry, t_b, c)
        o = o * jax.lax.rsqrt(jnp.mean(jnp.square(o)) + 1e-6)
        return o, None
    z, _ = jax.lax.scan(body, z, None, length=N)
    return jnp.sum(z)


print("compiling bare fwd...", flush=True)
_ = float(np.asarray(fwd_loop(params["unet"], z0, jnp.float32(0), zc)))
t0 = time.perf_counter()
for i in range(3):
    s = float(np.asarray(fwd_loop(params["unet"], z0, jnp.float32(i + 1), zc)))
dt = (time.perf_counter() - t0) / 3 / N
print(f"bare fwd : {dt*1e3:6.3f} ms/step  [chk {s:.4e}]", flush=True)

y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))
M = 100
def run(seed):
    return ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed), y,
                     timesteps=M, return_decoded=True)
print("compiling sampler...", flush=True)
out = run(0)
_ = float(np.asarray(out, np.float32).sum())
t0 = time.perf_counter()
for i in range(3):
    out = run(i + 1)
    s = float(np.asarray(out, np.float32).sum())
dt = (time.perf_counter() - t0) / 3 / M
print(f"sampler  : {dt*1e3:6.3f} ms/step ({1/dt:6.1f} steps/s)  [chk {s:.4e}]",
      flush=True)
