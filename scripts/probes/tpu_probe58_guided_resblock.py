"""Round-3 probe R: guided-sampling throughput with the whole-resblock
fused kernel (ops/pallas_resblock.py) in the alignment network.

probe47b/54: the guidance mean shift is op-count-bound (~500 tiny alignment
fwd+bwd ops, ~536 us/step in-chain).  The resblock kernel collapses the two
TimeEmbedResBlocks — the largest remaining op block after the fused
attention/FFN kernels — to ONE forward + ONE backward Pallas call each.
Measures: unguided reference, guided with the resblock kernel (default
'auto'), guided without it (previous round-3 state), and each combined with
align.compute_dtype bf16 (probe57's lever).  20-step chain correlation
guards numerics.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

print("backend:", jax.default_backend(), flush=True)
M = 100


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


y1 = jnp.asarray(np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))
avg = jnp.full((1, 1), 0.1, jnp.float32)

CASES = {
    "unguided": {},
    "rb_on_f32": {"use_pallas_resblock": "auto", "compute_dtype": "float32"},
    "rb_off_f32": {"use_pallas_resblock": False, "compute_dtype": "float32"},
    "rb_on_bf16": {"use_pallas_resblock": "auto", "compute_dtype": "bfloat16"},
    "rb_off_bf16": {"use_pallas_resblock": False, "compute_dtype": "bfloat16"},
}
which = os.environ.get("P58", ",".join(CASES)).split(",")
outs = {}
for tag in which:
    opts = CASES[tag]
    cfg = prediff_default_config()
    if tag != "unguided":
        cfg.model.align.model_args.use_pallas_resblock = opts["use_pallas_resblock"]
        cfg.model.align.compute_dtype = opts["compute_dtype"]
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                                with_alignment=True)
    kw = {} if tag == "unguided" else dict(
        use_alignment=True, alignment_kwargs={"avg_x_gt": avg})
    timeit(
        f"{tag} B=1 (100 DDPM)",
        lambda s, ld=ld, params=params, kw=kw: jnp.sum(ld.sample(
            params["unet"], params["vae"], jax.random.PRNGKey(s), y1,
            timesteps=M, **kw)),
        per=M)
    outs[tag] = np.asarray(ld.sample(
        params["unet"], params["vae"], jax.random.PRNGKey(42), y1,
        timesteps=20, **kw))

ref_tag = "rb_off_f32" if "rb_off_f32" in outs else None
if ref_tag:
    a = outs[ref_tag].ravel()
    for tag, o in outs.items():
        if tag in (ref_tag, "unguided"):
            continue
        b = o.ravel()
        corr = float(np.corrcoef(a, b)[0, 1])
        print(f"20-step chain corr {tag} vs {ref_tag}: {corr:.6f}", flush=True)
