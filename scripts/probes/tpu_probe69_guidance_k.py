"""Round-4 probe: guided-sampling throughput vs guidance_every_k.

probe47b root-caused the guided gap (0.925x vs the 0.95 target) to the
alignment net's own fwd+bwd at tiny shapes — compute, not dispatch.
guidance_every_k=k skips that work on all but every k-th step (lax.cond,
one branch executes), scaled by k.  Expected ceiling: with overhead o per
step, ratio(k) ~= 1 / (1 + o/k); o ~= 0.08 -> k=2 ~0.96, k=4 ~0.98.

Accuracy side: scripts/probes/guidance_every_k_eval.py (CPU, trained tiny
pipeline).  Protocol: warmup case first, chained chains, scalar fetch.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prediff_tpu.config import prediff_default_config  # noqa: E402
from prediff_tpu.factory import build_pipeline  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
M = 100


def timeit(tag, fn, n_iter=3, per=1.0):
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(fn(0)))
    t0 = time.perf_counter()
    for i in range(n_iter):
        s = float(np.asarray(fn(i + 1)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{tag:28s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} steps/s)  "
          f"[chk {s:.4e}]", flush=True)
    return dt


cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                            with_alignment=True)
y1 = jnp.asarray(
    np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))
avg = jnp.full((1, 1), 0.1, jnp.float32)

CASES = {
    "warmup": dict(),
    "unguided": dict(),
    "guided_k1": dict(use_alignment=True,
                      alignment_kwargs={"avg_x_gt": avg}),
    "guided_k2": dict(use_alignment=True,
                      alignment_kwargs={"avg_x_gt": avg},
                      guidance_every_k=2),
    "guided_k4": dict(use_alignment=True,
                      alignment_kwargs={"avg_x_gt": avg},
                      guidance_every_k=4),
}
which = os.environ.get("P69", ",".join(CASES)).split(",")
times = {}
for tag in which:
    kw = CASES[tag]
    times[tag] = timeit(
        f"{tag} B=1 ({M} DDPM)",
        lambda s, kw=kw: jnp.sum(ld.sample(
            params["unet"], params["vae"], jax.random.PRNGKey(s), y1,
            timesteps=M, return_decoded=True, **kw)),
        per=M,
    )
if "unguided" in times:
    for tag, dt in times.items():
        if tag.startswith("guided"):
            print(f"ratio {tag}: {times['unguided']/dt:.4f} "
                  f"(target >= 0.95)", flush=True)
print("probe69 done", flush=True)
