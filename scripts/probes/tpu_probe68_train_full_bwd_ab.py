"""Round-4 probe: train-step A/B matrix for the new one-kernel backwards.

Cases (all B=8, latent-cache inputs, rbg+conv3d-auto defaults):
  drop0_xla     dropout-0 recipe, kernels OFF        (r3: 28.6 samples/s)
  drop0_kernels dropout-0, kernels ON — now with the attention + GN
                all-grads backwards (r3 was parity at 28.6; VERDICT #1
                'done' = measurably ahead)
  v1_xla        v1 recipe (dropout .1), kernel-dropout OFF -> attention/FFN
                fall back to XLA (r3: ~24.2-24.7)
  v1_kdrop      v1 recipe with use_pallas_dropout=True (VERDICT #2
                'done' = beats v1_xla)
  pack0/pack64k pack_small_thr A/B on the winning drop0 config
                (ADVICE r3: close the probe66 loop)

Protocol (CLAUDE.md): warmup case first, chained K-step loops, device-scalar
fetch, one process; PROBE_PHASE env to run a subset in fresh processes.
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
K = 5
NITER = 6
B = 8


def make_ld(drop, kernels, kernel_dropout=False):
    c = prediff_default_config()
    m = c.model.latent_model
    m.attn_drop = m.proj_drop = m.ffn_drop = drop
    if not kernels:
        m.use_pallas_attention = False
        m.use_pallas_ffn = False
        m.use_pallas_gn = False
    if kernel_dropout:
        m.use_pallas_dropout = True
    return build_pipeline(c, rng=jax.random.PRNGKey(0), with_alignment=False)


def bench_phase(tag, drop, kernels, kernel_dropout=False, thr=0):
    ld, params = make_ld(drop, kernels, kernel_dropout)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
    enc = jax.jit(lambda v, s: ld._unframes(
        ld.first_stage_moments(v, ld._frames(s)[0]), s.shape[0]))
    mx = enc(params["vae"], x)
    my = enc(params["vae"], y)
    tr = DiffusionTrainer(
        ld, params["vae"], optim_config=dict(lr=1e-4, total_num_steps=1000),
        prng_impl="auto", conv3d_impl="auto", latent_inputs=True,
        pack_small_thr=thr,
    )
    state = tr.create_state(params["unet"])
    rng = jax.random.PRNGKey(1)
    state, mets = tr.train_step(state, rng, mx, my)
    _ = float(np.asarray(mets["train/loss"]))
    t0 = time.perf_counter()
    for i in range(NITER):
        for k in range(K):
            state, mets = tr.train_step(
                state, jax.random.fold_in(rng, i * K + k), mx, my)
        _ = float(np.asarray(mets["train/loss"]))
    dt = (time.perf_counter() - t0) / (NITER * K)
    print(f"{tag:16s}: {dt*1000:7.1f} ms/step  ({B/dt:6.2f} samples/s)  "
          f"[loss {float(mets['train/loss']):.4f}  "
          f"gnorm {float(mets['grad_norm']):.4f}]", flush=True)
    del ld, params, tr, state, mx, my, enc
    jax.clear_caches()
    gc.collect()


PHASES = {
    "warmup": dict(drop=0.0, kernels=True),
    "drop0_xla": dict(drop=0.0, kernels=False),
    "drop0_kernels": dict(drop=0.0, kernels=True),
    "v1_xla": dict(drop=0.1, kernels=True),  # dropout locks kernels out
    "v1_kdrop": dict(drop=0.1, kernels=True, kernel_dropout=True),
    "pack0": dict(drop=0.0, kernels=True, thr=0),
    "pack64k": dict(drop=0.0, kernels=True, thr=65536),
}
want = os.environ.get("PROBE_PHASE")
for tag, kw in PHASES.items():
    if want and tag not in want.split(","):
        continue
    bench_phase(tag, **kw)
print("probe68 done", flush=True)
