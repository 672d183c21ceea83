"""Round-3 probe E: ablate the three train-step optimizations on the v1
flagship config (dropout .1, rbg RNG, B=8):

  flat  — EmaTrainState.flat_update: clip/adam/EMA on ONE raveled vector
          instead of ~4 tiny fusions per param leaf (probe41/44: per-leaf
          dispatch overhead ~tens of ms/step)
  prec  — jax.default_matmul_precision('bfloat16') around the loss: 1-pass
          bf16 MXU operands for the f32 convs XLA's demotion pass skips in
          the train graph (probe44: VAE encoder + time-embed convs run f32)
  fs16  — first_stage_dtype bf16: cast the frozen-VAE encode's activations
          + params to bf16 (HBM-bound (B*T,128,128,C) tensors)

Run each toggle alone and all together, against the round-3 baseline
(all off = probe43's rbg numbers).
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
    print(f"{tag:34s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} /s)  [chk {s:.4e}]",
          flush=True)
    return dt


cfg = prediff_default_config()
VARIANTS = [
    ("base", dict(flat=False, prec=None, fs="float32")),
    ("flat", dict(flat=True, prec=None, fs="float32")),
    ("prec", dict(flat=False, prec="bfloat16", fs="float32")),
    ("fs16", dict(flat=False, prec=None, fs="bfloat16")),
    ("all", dict(flat=True, prec="bfloat16", fs="bfloat16")),
]
B = 8
for tag, v in VARIANTS:
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
    ld.first_stage_dtype = v["fs"]
    tr = DiffusionTrainer(
        ld, params["vae"], prng_impl="rbg",
        flat_update=v["flat"], matmul_precision=v["prec"],
    )
    x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
    holder = {"state": tr.create_state(params["unet"])}

    def run(s, holder=holder, tr=tr, x=x, y=y):
        for j in range(5):
            holder["state"], metrics = tr.train_step(
                holder["state"], jax.random.PRNGKey(s * 7 + j), x, y)
        return metrics["train/loss"]

    timeit(f"train v1 B={B} {tag}", run, per=5 * B)
    del holder, tr, run, x, y, ld, params
    jax.clear_caches()
    gc.collect()
print("probe45 done", flush=True)
