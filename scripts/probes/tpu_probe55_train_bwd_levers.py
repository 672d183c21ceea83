"""Round-3 probe O: what are the slow train-step backward fusions made of?

probe41/44: ~57 ms of the 357 ms B=8 step sits in 16 tuple-output fusions
attributed to the FFNs' ffn_2 dot_generals (~1068 us each, (f32[1024],
bf16[...,1024]) outputs) — the gelu-bwd elementwise + bias-grad reductions
around the dw GEMMs.  probe46 showed no pathology in ISOLATION, so test
in situ by ablating the whole step:

  gelu   - shipped default (exact erf gelu)
  relu   - diagnostic: if the transcendental gelu-bwd chain is the cost,
           relu should recover most of the 57 ms (NOT shippable - parity)
  remat  - jax.checkpoint over the loss: different saved-intermediate set
           changes the bwd fusion structure (shippable option if faster)

All at B=8, dropout .1, rbg RNG, fs16 encode, conv3d xla (the shipped
defaults).  Whole-step timing (fixed dispatch cost ~30 ms amortizes over
5-step loops x3 iters of ~1.6 s - probe49 methodology).
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
B = 8


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


which = os.environ.get("P55", "gelu,relu,remat").split(",")
for tag in which:
    cfg = prediff_default_config()
    kw = {}
    if tag == "relu":
        cfg.model.latent_model.ffn_activation = "relu"
    if tag == "remat":
        kw["remat_unet"] = True
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                                with_alignment=False)
    tr = DiffusionTrainer(ld, params["vae"], prng_impl="rbg",
                          conv3d_impl="auto", **kw)
    x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
    holder = {"state": tr.create_state(params["unet"])}

    def run(s, holder=holder, tr=tr, x=x, y=y):
        for j in range(5):
            holder["state"], metrics = tr.train_step(
                holder["state"], jax.random.PRNGKey(s * 7 + j), x, y)
        return metrics["train/loss"]

    timeit(f"train B={B} {tag}", run, per=5 * B)
    del holder, tr, run, x, y, ld, params
    jax.clear_caches()
    gc.collect()
print("probe55 done", flush=True)
