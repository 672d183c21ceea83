"""Round-3 probe I: whole-train-step effect of optim.conv3d_impl='xla'.

probe46/48 measured isolated conv chains (native XLA 3-D conv ~6-10% faster
fwd+dx+dw than t2d at B=8 train shapes).  This verifies the win survives in
the full v1 train step (dropout .1, rbg RNG, fs16 encode — the shipped
defaults) at B=2 and B=8, and that the losses agree.
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
_bs = [int(b) for b in os.environ.get("P49_B", "8,2").split(",")]
_impls = [None if i == "t2d" else i
          for i in os.environ.get("P49_IMPL", "t2d,xla").split(",")]
for B in _bs:
    for impl in _impls:
        ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                                    with_alignment=False)
        tr = DiffusionTrainer(
            ld, params["vae"], prng_impl="rbg", conv3d_impl=impl,
        )
        x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
        y = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
        holder = {"state": tr.create_state(params["unet"])}

        def run(s, holder=holder, tr=tr, x=x, y=y):
            for j in range(5):
                holder["state"], metrics = tr.train_step(
                    holder["state"], jax.random.PRNGKey(s * 7 + j), x, y)
            return metrics["train/loss"]

        timeit(f"train v1 B={B} conv={impl or 't2d'}", run, per=5 * B)
        del holder, tr, run, x, y, ld, params
        jax.clear_caches()
        gc.collect()
print("probe49 done", flush=True)
