"""Round-3 probe A2 (fresh process): train-step throughput only.

probe40's single process OOM'd HBM at the B=8 bench: every bench_train
builds a fresh optimizer state while the jit caches of the earlier sampling
benches are still resident.  Here: one config per phase, explicit cache
drops between phases.

PROBE_PHASE env: v1 | drop0_xla | drop0_kernels  (default: all, B=2,8)
"""
import sys, os, time, gc
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

print("backend:", jax.default_backend(), flush=True)


def timeit(tag, fn, n_iter=3, per=1.0):
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(fn(0)))
    t0 = time.perf_counter()
    for i in range(n_iter):
        s = float(np.asarray(fn(i + 1)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{tag:30s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} /s)  [chk {s:.4e}]",
          flush=True)
    return dt


def make_ld(drop, kernels):
    c = prediff_default_config()
    m = c.model.latent_model
    m.attn_drop = m.proj_drop = m.ffn_drop = drop
    if not kernels:
        m.use_pallas_attention = False
        m.use_pallas_ffn = False
        m.use_pallas_gn = False
    return build_pipeline(c, rng=jax.random.PRNGKey(0), with_alignment=False)


PHASES = {
    "v1": (0.1, True),          # dropout active -> kernels off by design
    "drop0_xla": (0.0, False),
    "drop0_kernels": (0.0, True),
}
want = os.environ.get("PROBE_PHASE")
for name, (drop, kernels) in PHASES.items():
    if want and name != want:
        continue
    ld, params = make_ld(drop, kernels)
    for B in (2, 8):
        tr = DiffusionTrainer(ld, params["vae"])
        x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
        y = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
        holder = {"state": tr.create_state(params["unet"])}

        def run(s, holder=holder, tr=tr, x=x, y=y):
            for j in range(5):
                holder["state"], metrics = tr.train_step(
                    holder["state"], jax.random.PRNGKey(s * 7 + j), x, y)
            return metrics["train/loss"]
        timeit(f"train {name} x5 B={B}", run, per=5 * B)
        del holder, tr, run, x, y
        jax.clear_caches()
        gc.collect()
    del ld, params
    jax.clear_caches()
    gc.collect()
print("probe40c done", flush=True)
