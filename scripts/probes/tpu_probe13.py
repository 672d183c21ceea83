"""Round-2 probe: where do ~13 ms/step go in the scanned sampler?

Decomposition ladder (all v1-size UNet, B=1, idle host, chained host fetch):
  A) 100 separate chained dispatches of the bare UNet forward  (round-1: 0.64 ms/step)
  B) one jit of a 100-step lax.scan of the bare UNet forward   (no sampler math)
  C) B + per-step fold_in/normal RNG                            (noise only)
  D) the real sampler scan (p_mean_variance + schedule gathers + noise)

If B >> A: while-loop/scan structure itself is the problem (XLA can't
specialize or schedule across iterations; or the relay mis-times chained
dispatches).  If D >> C ~ B ~ A: the sampler arithmetic is the tail.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
unet_apply = ld.unet_apply
unet_params = params["unet"]

B = 1
N = 100
z0 = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))


def fetch(x):
    return float(np.asarray(x, np.float32).sum())


def timeit(fn, *args, iters=3, tag=""):
    out = fn(*args)
    warm = fetch(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*args)
        s = fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: {dt*1000:7.1f} ms total = {dt/N*1000:6.2f} ms/step "
          f"({N/dt:5.1f} steps/s)  [warm {warm:.3e}]", flush=True)
    return dt


# ---- A: separate chained dispatches --------------------------------------
fwd = jax.jit(lambda p, z, t, c: unet_apply({"params": p}, z, t, c))
t_b = jnp.zeros((B,), jnp.int32)


def run_chained(z):
    for i in range(N):
        z = fwd(unet_params, z, t_b, zc)
    return z


print("compiling A (single forward)...", flush=True)
timeit(run_chained, z0, tag="A chained dispatches")

# ---- B: bare-forward scan --------------------------------------------------
@jax.jit
def run_scan_bare(p, z, c):
    def body(carry, t):
        out = unet_apply({"params": p}, carry, jnp.full((B,), t, jnp.int32), c)
        return out, None
    z, _ = jax.lax.scan(body, z, jnp.arange(N, dtype=jnp.int32))
    return z


print("compiling B (bare scan)...", flush=True)
timeit(run_scan_bare, unet_params, z0, zc, tag="B bare scan         ")

# ---- C: bare scan + per-step RNG normal -----------------------------------
@jax.jit
def run_scan_rng(p, z, c, key):
    def body(carry, t):
        out = unet_apply({"params": p}, carry, jnp.full((B,), t, jnp.int32), c)
        step_rng = jax.random.fold_in(key, t)
        noise = jax.random.normal(step_rng, carry.shape, carry.dtype)
        return out + 0.0 * noise, None
    z, _ = jax.lax.scan(body, z, jnp.arange(N, dtype=jnp.int32))
    return z


print("compiling C (scan + rng)...", flush=True)
timeit(run_scan_rng, unet_params, z0, zc, rng, tag="C scan + rng        ")

# ---- D: real sampler (latent only: no VAE encode/decode) -------------------
def run_sampler(seed):
    return ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed),
                     jnp.zeros((B, 7, 128, 128, 1), jnp.float32),
                     timesteps=N, return_decoded=False)


print("compiling D (full sampler, latent out)...", flush=True)
out = run_sampler(0)
warm = fetch(out)
t0 = time.perf_counter()
for i in range(3):
    out = run_sampler(i + 1)
    fetch(out)
dt = (time.perf_counter() - t0) / 3
print(f"D full sampler      : {dt*1000:7.1f} ms total = {dt/N*1000:6.2f} ms/step "
      f"({N/dt:5.1f} steps/s)  [warm {warm:.3e}]", flush=True)
