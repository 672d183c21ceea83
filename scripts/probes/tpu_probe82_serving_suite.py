"""probe82: refresh the BASELINE.md benchmark-config suite at round-5 HEAD.

Covers configs 1-4 (the batch-scaling half of #5 is probe81):
  1. VAE encode 7-frame context / decode 6-frame latent (B=1)
  2. full 100-step DDPM chain B=1 (matches bench.py headline)
  3. guided (knowledge-alignment) 100-step chain B=1, k=1 default
  4. guided chain with the opt-in guidance_every_k=2
  5. DDIM-50 forecast latency (fast serving path)

Relay protocol (CLAUDE.md): warmup case first, device-side scalar fetch,
one process, unguided anchor re-run at the end to bound drift.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=True)
M = 100
y1 = jnp.asarray(np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))
avg = jnp.full((1, 6, 1), 0.1, jnp.float32)


def timeit(tag, fn, n_iter=3, per=1.0):
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(fn(0)))
    t0 = time.perf_counter()
    for i in range(n_iter):
        s = float(np.asarray(fn(i + 1)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{tag:26s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} /s)  [chk {s:.4e}]",
          flush=True)
    return dt


def unguided(s):
    return jnp.sum(ld.sample(params["unet"], params["vae"],
                             jax.random.PRNGKey(s), y1, timesteps=M,
                             return_decoded=True))


def guided(k):
    def run(s):
        return jnp.sum(ld.sample(
            params["unet"], params["vae"], jax.random.PRNGKey(s), y1,
            timesteps=M, return_decoded=True, use_alignment=True,
            alignment_kwargs={"avg_x_gt": avg}, guidance_every_k=k))
    return run


def ddim50(s):
    return jnp.sum(ld.sample(params["unet"], params["vae"],
                             jax.random.PRNGKey(s), y1,
                             sampler="ddim", ddim_steps=50,
                             return_decoded=True))


from prediff_tpu.models.vae import AutoencoderKL  # noqa: E402 (after path fix)

vae_cfg = cfg["model"]["vae"]
enc = jax.jit(lambda p, y: ld.cond_stage_forward(p, y))
z6 = jnp.asarray(np.random.RandomState(1).rand(1, 6, 16, 16, 64).astype(np.float32))
dec = jax.jit(lambda p, z: ld.decode_first_stage(p, z))

timeit("WARMUP chain B=1", unguided, per=M)
t_un = timeit("chain B=1 (100 DDPM)", unguided, per=M)
t_g1 = timeit("guided k=1 (100 DDPM)", guided(1), per=M)
t_g2 = timeit("guided k=2 (100 DDPM)", guided(2), per=M)
timeit("DDIM-50 forecast", ddim50, per=1)
timeit("VAE encode 7f", lambda s: jnp.sum(enc(params["vae"], y1 + 0 * s)), per=1)
timeit("VAE decode 6f", lambda s: jnp.sum(dec(params["vae"], z6 + 0 * s)), per=1)
t_un2 = timeit("chain B=1 re-anchor", unguided, per=M)
print(f"guided ratios: k=1 {t_un/t_g1:.4f}x, k=2 {t_un/t_g2:.4f}x "
      f"(anchor drift {t_un2/t_un:.3f})", flush=True)
