"""Round-3 probe: pack-small-leaves optimizer/EMA update A/B.

probe61: the B=8 train step carries ~22.5 ms of tiny async-copy/slice ops
from per-leaf optimizer+EMA traffic (640 leaves).  probe45: full ravel
(flat_update) was 7% SLOWER (concatenate copies of all 137M params).
Middle ground: EmaTrainState.pack_small_thr packs only the small leaves
(thr=65536: 454 leaves, 1.3% of elements) into one flat vector.

Protocol (CLAUDE.md): warmup case first (absorbs the one-time staging
cost), chained steps, device-scalar fetch, all cases in one process.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

print("backend:", jax.default_backend(), flush=True)
K = 5
NITER = 8
B = 8

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
rs = np.random.RandomState(0)

x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
enc = jax.jit(lambda v, s: ld._unframes(
    ld.first_stage_moments(v, ld._frames(s)[0]), s.shape[0]))
mx = enc(params["vae"], x)
my = enc(params["vae"], y)

# warmup case (results discarded) then the A/B cases
cases = [("warmup", 0), ("per-leaf", 0), ("pack-64k", 65536),
         ("pack-256k", 262144), ("per-leaf2", 0)]
for tag, thr in cases:
    tr = DiffusionTrainer(
        ld, params["vae"], optim_config=dict(lr=1e-4, total_num_steps=1000),
        prng_impl="auto", conv3d_impl="auto", latent_inputs=True,
        pack_small_thr=thr,
    )
    state = tr.create_state(params["unet"])
    step = tr.train_step
    rng = jax.random.PRNGKey(1)
    state, mets = step(state, rng, mx, my)
    _ = float(np.asarray(mets["train/loss"]))
    t0 = time.perf_counter()
    for i in range(NITER):
        for k in range(K):
            state, mets = step(state, jax.random.fold_in(rng, i * K + k), mx, my)
        _ = float(np.asarray(mets["train/loss"]))
    dt = (time.perf_counter() - t0) / (NITER * K)
    print(f"{tag:10s} thr={thr:>7d}: {dt*1000:7.1f} ms/step  "
          f"({B/dt:6.2f} samples/s)  [loss {float(mets['train/loss']):.4f}  "
          f"gnorm {float(mets['grad_norm']):.4f}]", flush=True)
print("probe66 done", flush=True)
