"""Round-3 probe N: does the fused conv3x3x3 kernel close the guidance gap?

probe47b: the alignment mean shift costs ~966 us device/step, half of it
while-loop sequencing across ~500 tiny ops; the resblock conv glue (t2d =
3 convs + pad/reshape per site, ~8-11 ops) is the largest op-count block.
The pallas conv is ONE op per site (plus one fused dx op under the guidance
gradient).  Per-op device time is slightly higher than t2d at B=1 UNet
shapes (probe53: 130 vs 88 us true), but the alignment net's convs are
microseconds — the win here is op COUNT, not FLOPs.

Measures guided/unguided ratio with the alignment net's conv kernel off vs
on (everything else at shipped defaults).  probe40b methodology: whole
100-step chains, chained seeds, device-side scalar fetch.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

print("backend:", jax.default_backend(), flush=True)
M = 100


def timeit(tag, fn, n_iter=3, per=1.0):
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(fn(0)))
    t0 = time.perf_counter()
    for i in range(n_iter):
        s = float(np.asarray(fn(i + 1)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{tag:34s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} /s)  [chk {s:.4e}]",
          flush=True)
    return dt


y1 = jnp.asarray(np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))
avg = jnp.full((1, 1), 0.1, jnp.float32)

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=True)
t_unguided = timeit("unguided B=1 (100 DDPM)", lambda s: jnp.sum(ld.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y1, timesteps=M)),
    per=M)
t_g_off = timeit("guided, align conv t2d", lambda s: jnp.sum(ld.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y1, timesteps=M,
    use_alignment=True, alignment_kwargs={"avg_x_gt": avg})), per=M)

cfg2 = prediff_default_config()
cfg2.model.align.model_args.use_pallas_conv = True
ld2, params2 = build_pipeline(cfg2, rng=jax.random.PRNGKey(0), with_alignment=True)
t_g_on = timeit("guided, align conv pallas", lambda s: jnp.sum(ld2.sample(
    params2["unet"], params2["vae"], jax.random.PRNGKey(s), y1, timesteps=M,
    use_alignment=True, alignment_kwargs={"avg_x_gt": avg})), per=M)

# numerical check: same chain, both paths
o_off = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(9), y1,
                  timesteps=20, use_alignment=True,
                  alignment_kwargs={"avg_x_gt": avg})
o_on = ld2.sample(params2["unet"], params2["vae"], jax.random.PRNGKey(9), y1,
                  timesteps=20, use_alignment=True,
                  alignment_kwargs={"avg_x_gt": avg})
corr = np.corrcoef(np.asarray(o_off, np.float32).ravel(),
                   np.asarray(o_on, np.float32).ravel())[0, 1]
print(f"20-step guided chain corr(conv off, on) = {corr:.6f}", flush=True)
print(f"ratio off: {t_unguided/t_g_off:.3f}   ratio on: {t_unguided/t_g_on:.3f}"
      f"   (target >= 0.95)", flush=True)
print("probe54 done", flush=True)
