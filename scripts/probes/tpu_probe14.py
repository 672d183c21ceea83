"""Round-2 probe: alternative sampler structures at B=1 (run after probe13).

  E) segment-chained sampler: jit(K unrolled ddpm steps), Python-chained —
     no lax.scan/while at all.  If chained dispatches are genuinely fast
     (probe13 A), this should approach them while keeping dispatch count low.
  F) scan with per-step coefficient arrays passed as scan xs (no dynamic
     gathers from schedule buffers inside the body).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.diffusion import core

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
unet_apply = ld.unet_apply
sch = ld.schedule

B, N, K = 1, 100, 10  # N total steps, K steps per jitted segment
z0 = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))


def fetch(x):
    return float(np.asarray(x, np.float32).sum())


def report(tag, dt, warm):
    print(f"{tag}: {dt*1000:7.1f} ms total = {dt/N*1000:6.2f} ms/step "
          f"({N/dt:5.1f} steps/s)  [warm {warm:.3e}]", flush=True)


def ddpm_step(p, z, t_scalar, c, key):
    t_b = jnp.full((B,), t_scalar, jnp.int32)
    eps = unet_apply({"params": p}, z, t_b, c)
    mean, _, log_var, _ = core.p_mean_variance(sch, eps, z, t_b,
                                               parameterization="eps",
                                               clip_denoised=False)
    noise = jax.random.normal(jax.random.fold_in(key, t_scalar), z.shape, z.dtype)
    nz = (t_scalar > 0).astype(z.dtype)
    return mean + nz * jnp.exp(0.5 * log_var) * noise


# ---- E: segment-chained (Python loop over jitted K-step unrolled segments) --
@jax.jit
def segment(p, z, c, key, ts):  # ts: (K,) static-length array of step ids
    for i in range(K):
        z = ddpm_step(p, z, ts[i], c, key)
    return z


def run_segmented(seed):
    key = jax.random.PRNGKey(seed)
    z = z0
    ts_all = np.arange(N - 1, -1, -1, dtype=np.int32)
    for s in range(N // K):
        z = segment(params["unet"], z, zc, key, jnp.asarray(ts_all[s * K:(s + 1) * K]))
    return z


print("compiling E (segment chain)...", flush=True)
out = run_segmented(0)
warm = fetch(out)
t0 = time.perf_counter()
for i in range(3):
    fetch(run_segmented(i + 1))
dt = (time.perf_counter() - t0) / 3
report("E segment chain     ", dt, warm)


# ---- F: scan with precomputed per-step coefficients as xs ------------------
ts_all = np.arange(N - 1, -1, -1, dtype=np.int64)
c1 = np.asarray(sch.posterior_mean_coef1)[ts_all].astype(np.float32)
c2 = np.asarray(sch.posterior_mean_coef2)[ts_all].astype(np.float32)
sr = np.asarray(sch.sqrt_recip_alphas_cumprod)[ts_all].astype(np.float32)
srm = np.asarray(sch.sqrt_recipm1_alphas_cumprod)[ts_all].astype(np.float32)
plv = np.asarray(sch.posterior_log_variance_clipped)[ts_all].astype(np.float32)
nz_all = (ts_all > 0).astype(np.float32)


@jax.jit
def run_scan_coef(p, z, c, key):
    xs = (jnp.asarray(ts_all.astype(np.int32)), jnp.asarray(c1), jnp.asarray(c2),
          jnp.asarray(sr), jnp.asarray(srm), jnp.asarray(plv), jnp.asarray(nz_all))

    def body(z, x):
        t, k1, k2, a, b, lv, nz = x
        t_b = jnp.full((B,), t, jnp.int32)
        eps = unet_apply({"params": p}, z, t_b, c)
        x0 = a * z - b * eps
        mean = k1 * x0 + k2 * z
        noise = jax.random.normal(jax.random.fold_in(key, t), z.shape, z.dtype)
        return mean + nz * jnp.exp(0.5 * lv) * noise, None

    z, _ = jax.lax.scan(body, z, xs)
    return z


print("compiling F (coef-xs scan)...", flush=True)
out = run_scan_coef(params["unet"], z0, zc, rng)
warm = fetch(out)
t0 = time.perf_counter()
for i in range(3):
    fetch(run_scan_coef(params["unet"], z0, zc, jax.random.PRNGKey(i + 1)))
dt = (time.perf_counter() - t0) / 3
report("F coef-xs scan      ", dt, warm)
