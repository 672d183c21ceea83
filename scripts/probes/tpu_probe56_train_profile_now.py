"""Round-3 probe P: fresh train-step device profile at the CURRENT shipped
defaults (rbg RNG, fs16 encode, conv3d 'auto'->xla at B=8), with the HLO
op_name join — probe41/44's numbers were taken on the threefry/t2d config.

Prints: total device ms/step, op-execution count, top source paths (fwd/bwd
marked), and a category rollup (dropout, conv, dense-bwd reduces, optimizer,
reorder copies) to aim the next optimization.
"""
import sys, os, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

print("backend:", jax.default_backend(), flush=True)
B = int(os.environ.get("PROBE_B", "8"))
NITER = int(os.environ.get("PROBE_NITER", "10"))

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
tr = DiffusionTrainer(ld, params["vae"], prng_impl="rbg", conv3d_impl="auto")
x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
state = tr.create_state(params["unet"])
step = tr.make_train_step()

print("compiling for HLO text...", flush=True)
compiled = step.lower(state, jax.random.PRNGKey(0), x, y).compile()
hlo = compiled.as_text()
meta = {}
for m in re.finditer(r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo):
    meta[m.group(1)] = m.group(2)
print(f"optimized HLO {len(hlo)} chars, {len(meta)} ops with metadata", flush=True)

holder = {"state": state}
holder["state"], mets = step(holder["state"], jax.random.PRNGKey(1), x, y)
_ = float(np.asarray(mets["train/loss"]))
trace_dir = "/tmp/jax-trace-train56"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    holder["state"], mets = step(holder["state"], jax.random.PRNGKey(2 + i), x, y)
_ = float(np.asarray(mets["train/loss"]))
jax.profiler.stop_trace()

pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
with open(pbs[0], "rb") as f:
    xs.ParseFromString(f.read())

tot = collections.Counter()
cnt = collections.Counter()
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    names = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            nm = names[ev.metadata_id]
            key = nm.split(" = ")[0].lstrip("%")
            tot[key] += ev.duration_ps
            cnt[key] += 1

total_ms = sum(tot.values()) / 1e9 / NITER
print(f"train step: {total_ms:.1f} ms device, "
      f"{sum(cnt.values())//NITER} op executions/step", flush=True)

WRAPPERS = ("jit(", "while", "body", "closed_call", "checkpoint")


def tag_of(src):
    parts = src.split("/")
    is_bwd = any(p.startswith("transpose(jvp(") for p in parts)
    parts = [p for p in parts
             if not any(p.startswith(w) for w in WRAPPERS)
             and not p.startswith("transpose(jvp(") and not p.startswith("jvp(")]
    tag = "/".join(parts[:3])[:80]
    return ("bwd " if is_bwd else "fwd ") + tag


grp_t = collections.Counter()
grp_c = collections.Counter()
for k, ps in tot.items():
    t = tag_of(meta.get(k, "?"))
    grp_t[t] += ps
    grp_c[t] += cnt[k]

print("\ntop 50 source paths by device time (ms/step):", flush=True)
for k, ps in grp_t.most_common(50):
    print(f"  {ps/1e9/NITER:8.3f} ms x{grp_c[k]//NITER:<5d} {k}", flush=True)

CATS = {
    "dropout": ("dropout", "bernoulli", "random_bits", "threefry", "rbg"),
    "conv": ("conv_general",),
    "ffn/dense": ("ffn", "dot_general", "dense"),
    "norm": ("layer_norm", "group_norm", "_gn_silu", "reduce"),
    "optimizer": ("adamw", "clip", "ema", "global_norm", "scale_by"),
    "reorder/copy": ("transpose", "reshape", "copy", "concatenate", "slice"),
}
cat_t = collections.Counter()
for k, ps in tot.items():
    src = meta.get(k, "?").lower()
    for cat, keys in CATS.items():
        if any(s in src for s in keys):
            cat_t[cat] += ps
            break
    else:
        cat_t["other"] += ps
print("\ncategory rollup (first-match, ms/step):", flush=True)
for cat, ps in cat_t.most_common():
    print(f"  {ps/1e9/NITER:8.3f} ms  {cat}", flush=True)
print("probe56 done", flush=True)
