"""Round-4 probe: steps_per_call (scanned multi-step train dispatch) A/B.

probe70 measured the drop0 B=8 train step at 155.4 ms DEVICE vs 203 ms
wall — a ~48 ms/dispatch relay gap (24-34 ms fixed dispatch cost, probe53,
plus fetch).  make_train_step_scan amortizes it over K optimizer steps per
dispatch; expected wall rate -> device rate as K grows.

Protocol (CLAUDE.md): warmup case first, chained state, one scalar fetch
per timed dispatch group, single process.
"""
import gc
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
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
B = 8
TOTAL_STEPS = 24  # per timed iteration group

cfg = prediff_default_config()
m = cfg.model.latent_model
m.attn_drop = m.proj_drop = m.ffn_drop = 0.0
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                            with_alignment=False)
rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
enc = jax.jit(lambda v, s: ld._unframes(
    ld.first_stage_moments(v, ld._frames(s)[0]), s.shape[0]))
mx, my = enc(params["vae"], x), enc(params["vae"], y)
tr = DiffusionTrainer(ld, params["vae"],
                      optim_config=dict(lr=1e-4, total_num_steps=10000),
                      prng_impl="auto", conv3d_impl="auto",
                      latent_inputs=True)
rng = jax.random.PRNGKey(1)


def run_case(tag, K, n_groups=3):
    state = tr.create_state(params["unet"])
    if K == 1:
        step = tr.make_train_step()
        call = lambda st: step(st, rng, mx, my)  # noqa: E731
        calls_per_group = TOTAL_STEPS
    else:
        mstep = tr.make_train_step_scan()
        mxs = jnp.broadcast_to(mx[None], (K,) + mx.shape)
        mys = jnp.broadcast_to(my[None], (K,) + my.shape)
        call = lambda st: mstep(st, rng, mxs, mys)  # noqa: E731
        calls_per_group = TOTAL_STEPS // K
    print(f"compiling {tag}...", flush=True)
    state, mets = call(state)
    _ = float(np.asarray(jax.tree_util.tree_leaves(mets)[0]).reshape(-1)[-1])
    t0 = time.perf_counter()
    for g in range(n_groups):
        for _ in range(calls_per_group):
            state, mets = call(state)
        _ = float(np.asarray(
            jax.tree_util.tree_leaves(mets)[0]).reshape(-1)[-1])
    dt = (time.perf_counter() - t0) / (n_groups * TOTAL_STEPS)
    print(f"{tag:12s}: {dt*1000:7.1f} ms/step  ({B/dt:6.2f} samples/s)",
          flush=True)
    del state, mets
    jax.clear_caches()
    gc.collect()


CASES = {"warmup": 1, "K1": 1, "K4": 4, "K8": 8}
want = os.environ.get("P71")
for tag, K in CASES.items():
    if want and tag not in want.split(","):
        continue
    run_case(tag, K)
print("probe71 done", flush=True)
