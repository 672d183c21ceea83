"""probe81: serving-shape sweep of the sampling chain at round-5 HEAD.

The Pallas kernels and their VMEM gates were tuned at B=1 (the bench
headline).  Production serving folds ensembles into the batch axis
(latent_diffusion.sample_ensemble), so B=4/8 is the shape that matters for
aggregate throughput.  This probe:
  1. prints the pallas_call fingerprint at B=1/4/8 (does a gate silently
     push layers to XLA as R grows with batch?  probe62 failure mode),
  2. times 100-step unguided DDPM chains at B=1/4/8 (warmup case first,
     device-side scalar fetch, one process, time-adjacent — CLAUDE.md
     relay protocol), re-anchoring B=1 at the end.
Round-2 record to compare: ensemble B=8 164.6 aggregate steps/s (probe32).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.utils.profiling import count_pallas_calls

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
M = 100


def chain(B):
    y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))

    def run(s):
        return jnp.sum(ld.sample(params["unet"], params["vae"],
                                 jax.random.PRNGKey(s), y, timesteps=M,
                                 return_decoded=True))
    return run


for B in (1, 4, 8):
    print(f"fingerprint B={B}: {count_pallas_calls(chain(B), 0)}", flush=True)


def timeit(tag, fn, n_iter=3, per=1.0):
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(fn(0)))
    t0 = time.perf_counter()
    for i in range(n_iter):
        s = float(np.asarray(fn(i + 1)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{tag:24s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} agg steps/s)  [chk {s:.4e}]",
          flush=True)
    return dt


timeit("WARMUP B=1 (discard)", chain(1), per=M)
t1 = timeit("chain B=1 (100 DDPM)", chain(1), per=M)
t4 = timeit("chain B=4 (100 DDPM)", chain(4), per=4 * M)
t8 = timeit("chain B=8 (100 DDPM)", chain(8), per=8 * M)
t1b = timeit("chain B=1 re-anchor", chain(1), per=M)
print(f"scaling: B=4 {t1*4/t4:.2f}x ideal, B=8 {t1*8/t8:.2f}x ideal "
      f"(anchor drift {t1b/t1:.3f})", flush=True)
