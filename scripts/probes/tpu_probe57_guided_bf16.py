"""Round-3 probe Q: bf16 guidance-shift computation vs f32.

probe47b/54: the guidance overhead (~536 us/step in-chain) is spread over
~500 small alignment fwd+bwd ops — bandwidth/sequencing, not FLOPs.
align.compute_dtype='bfloat16' halves the HBM traffic of every one of
those ops.  Measures guided throughput f32 vs bf16 (+ the unguided
reference) and the 20-step chain correlation.
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

results = {}
which = os.environ.get("P57", "unguided,f32,bf16").split(",")
lds = {}
for tag in which:
    cfg = prediff_default_config()
    if tag in ("f32", "bf16"):
        cfg.model.align.compute_dtype = (
            "float32" if tag == "f32" else "bfloat16")
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                                with_alignment=True)
    lds[tag] = (ld, params)
    kw = {} if tag == "unguided" else dict(
        use_alignment=True, alignment_kwargs={"avg_x_gt": avg})
    results[tag] = timeit(
        f"{tag} B=1 (100 DDPM)",
        lambda s, ld=ld, params=params, kw=kw: jnp.sum(ld.sample(
            params["unet"], params["vae"], jax.random.PRNGKey(s), y1,
            timesteps=M, **kw)),
        per=M)

if "f32" in lds and "bf16" in lds:
    outs = {}
    for tag in ("f32", "bf16"):
        ld, params = lds[tag]
        outs[tag] = ld.sample(params["unet"], params["vae"],
                              jax.random.PRNGKey(9), y1, timesteps=20,
                              use_alignment=True,
                              alignment_kwargs={"avg_x_gt": avg})
    corr = np.corrcoef(np.asarray(outs["f32"], np.float32).ravel(),
                       np.asarray(outs["bf16"], np.float32).ravel())[0, 1]
    print(f"20-step guided chain corr(f32, bf16) = {corr:.6f}", flush=True)
if "unguided" in results:
    for tag in ("f32", "bf16"):
        if tag in results:
            print(f"ratio {tag}: {results['unguided']/results[tag]:.3f}",
                  flush=True)
print("probe57 done", flush=True)
