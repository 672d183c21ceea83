"""Round-4 probe: bf16 params+activations for the DIFFUSION train step.

probe45 showed jax.default_matmul_precision('bfloat16') is a no-op here
(XLA already runs the MXU passes bf16), and probe75 showed the VAE-GAN
step still gains +4.6% from an explicit bf16 STORAGE cast (params +
activations) because that trims the f32 activation HBM traffic that the
excess-precision pass cannot remove.  This probe measures the same
storage-cast lever on the round-4 headline train path: B=8 latent-cache
diffusion step (ref workload: train_sevirlr_prediff.py).

Mechanism: subclass DiffusionTrainer, cast params['unet'] and the moment
batch to bf16 INSIDE the loss (autodiff transposes the cast, so grads /
optimizer / EMA state stay f32; logvar and the loss reduction stay f32).
Cases (drop0 recipe): kernels-on f32 vs bf16 (Pallas kernels stage VMEM
buffers at input dtype -> bf16 halves their staging bytes and relaxes the
byte gates), kernels-off f32 vs bf16 (pure-XLA control).

Protocol (CLAUDE.md): warmup case first, chained K-step loops with a
scalar fetch every K=5, one process, intra-process ratios only.

MEASURED (2026-08-19, one v5e via relay; the relay DEGRADED ~2.6x mid-run
— an external-contention regime shift, confirmed by re-running the
identical f32_kernels phase: 205.9 ms in the fast window at 11:45,
534.2 ms at 12:35.  Cross-window comparisons are therefore invalid; the
verdict below uses only WITHIN-window pairs, which were stable):
  fast window : warmup 205.8, f32_kernels 205.9 ms/step (38.86 samples/s
                — matches probe68's 203.3 for this fetch-every-5 protocol)
  slow window : bf16_kernels 539.3 | f32_xla 610.6 | bf16_xla 608.2
                | f32_kernels (re-run) 534.2
  pairs       : kernels  f32 534.2 vs bf16 539.3  -> bf16 -1.0% (noise)
                xla      f32 610.6 vs bf16 608.2  -> bf16 +0.4% (noise)
  numerics    : loss identical to 1e-4, gnorm 0.5952 vs 0.5938/0.5950.
  VERDICT: the bf16 params+activations STORAGE cast is a NO-OP on the
  diffusion train step, on both the kernel and the XLA path — unlike the
  VAE-GAN step's +4.6% (probe75).  The diffusion step's activations are
  tiny (16x16 latents); its HBM traffic is params/optimizer/EMA state
  (deliberately left f32) and the Pallas kernels' staging already fits
  VMEM gates, so halving activation bytes buys nothing.  Decision: NO
  diffusion-side compute_dtype knob; `optim.vae_compute_dtype` stays the
  only storage-dtype option.
  PROTOCOL LESSON (appended to CLAUDE.md): the relay can shift to a
  2-2.6x slower regime for tens of minutes; A/B cases must be paired
  adjacently in time AND anchored by re-running the baseline case when
  a jump appears mid-matrix.
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


class Bf16ActTrainer(DiffusionTrainer):
    """Casts unet params + moment batch to bf16 inside the loss."""

    def _loss_fn(self, params, rng, x, y, train, prefix, latent=None):
        cast = lambda t: jax.tree_util.tree_map(
            lambda l: l.astype(jnp.bfloat16)
            if jnp.issubdtype(l.dtype, jnp.floating) else l, t)
        params = dict(params, unet=cast(params["unet"]))
        return super()._loss_fn(params, rng, cast(x), cast(y), train,
                                prefix, latent)


def make_ld(kernels):
    c = prediff_default_config()
    m = c.model.latent_model
    m.attn_drop = m.proj_drop = m.ffn_drop = 0.0
    if not kernels:
        m.use_pallas_attention = False
        m.use_pallas_ffn = False
        m.use_pallas_gn = False
    return build_pipeline(c, rng=jax.random.PRNGKey(0), with_alignment=False)


def bench_phase(tag, kernels, bf16):
    ld, params = make_ld(kernels)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
    enc = jax.jit(lambda v, s: ld._unframes(
        ld.first_stage_moments(v, ld._frames(s)[0]), s.shape[0]))
    mx = enc(params["vae"], x)
    my = enc(params["vae"], y)
    cls = Bf16ActTrainer if bf16 else DiffusionTrainer
    tr = cls(
        ld, params["vae"], optim_config=dict(lr=1e-4, total_num_steps=1000),
        prng_impl="auto", conv3d_impl="auto", latent_inputs=True,
    )
    state = tr.create_state(params["unet"])
    rng = jax.random.PRNGKey(1)
    try:
        state, mets = tr.train_step(state, rng, mx, my)
        _ = float(np.asarray(mets["train/loss"]))
    except Exception as e:  # noqa: BLE001 — record compile failures
        print(f"{tag:16s}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
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
    "warmup": dict(kernels=True, bf16=False),
    "f32_kernels": dict(kernels=True, bf16=False),
    "bf16_kernels": dict(kernels=True, bf16=True),
    "f32_xla": dict(kernels=False, bf16=False),
    "bf16_xla": dict(kernels=False, bf16=True),
}
want = os.environ.get("PROBE_PHASE")
for tag, kw in PHASES.items():
    if want and tag not in want.split(","):
        continue
    bench_phase(tag, **kw)
print("probe78 done", flush=True)
