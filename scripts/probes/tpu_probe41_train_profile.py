"""Round-3 probe B: device op-profile + MFU of the train step (verdict #4).

Traces NITER chained B=8 train steps on the v5e (v1 config, dropout 0.1 —
the XLA path the flagship actually trains with), aggregates XLA-op self
times from the xplane.pb, and reports:
  - top ops by device time (the budget table)
  - category split (conv fwd / conv bwd / matmul / other)
  - MFU: compiled cost-analysis FLOPs / device-seconds vs v5e bf16 peak
"""
import sys, os, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

B = int(os.environ.get("PROBE_B", "8"))
NITER = int(os.environ.get("PROBE_NITER", "20"))
V5E_BF16_PEAK = 394e12  # fp8 788, bf16 394 TF/s

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
tr = DiffusionTrainer(ld, params["vae"])
x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
state = tr.create_state(params["unet"])
state, m = tr.train_step(state, jax.random.PRNGKey(0), x, y)
print("warm loss", float(m["train/loss"]), flush=True)

# cost analysis of the compiled step (FLOPs the compiler thinks it does)
lowered = jax.jit(
    lambda s, r, x, y: tr.train_step(s, r, x, y)
).lower(state, jax.random.PRNGKey(0), x, y)
try:
    ca = lowered.compile().cost_analysis()
    step_flops = float(ca.get("flops", float("nan")))
except Exception as e:  # pragma: no cover
    step_flops = float("nan")
    print("cost_analysis failed:", e, flush=True)
print(f"compiled step flops: {step_flops:.3e}", flush=True)

import time
t0 = time.perf_counter()
for i in range(NITER):
    state, m = tr.train_step(state, jax.random.PRNGKey(i), x, y)
_ = float(np.asarray(m["train/loss"]))
wall = (time.perf_counter() - t0) / NITER
print(f"wall per step: {wall*1000:.1f} ms ({B/wall:.1f} samples/s)", flush=True)

trace_dir = "/tmp/jax-trace-train"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    state, m = tr.train_step(state, jax.random.PRNGKey(100 + i), x, y)
_ = float(np.asarray(m["train/loss"]))
jax.profiler.stop_trace()
print("traced", flush=True)

pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

xs = xplane_pb2.XSpace()
with open(pbs[0], "rb") as f:
    xs.ParseFromString(f.read())

CATS = (
    ("conv", re.compile(r"conv|Conv")),
    ("matmul/dot", re.compile(r"dot|einsum|matmul")),
    ("reduce/norm", re.compile(r"reduce|norm|rsqrt|variance")),
    ("copy/transpose", re.compile(r"copy|transpose|reshape|bitcast|slice|pad|concat")),
)
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    names = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        tot = collections.Counter()
        cnt = collections.Counter()
        cats = collections.Counter()
        for ev in line.events:
            nm = names[ev.metadata_id]
            m2 = re.match(r"%([a-zA-Z\-_]+)[\.\d]* = ((?:\()?[a-z0-9]+\[[^\]]*\])", nm)
            key = f"{m2.group(1)} {m2.group(2)[:45]}" if m2 else nm[:60]
            tot[key] += ev.duration_ps
            cnt[key] += 1
            for cat, pat in CATS:
                if pat.search(nm):
                    cats[cat] += ev.duration_ps
                    break
            else:
                cats["other"] += ev.duration_ps
        total = sum(tot.values())
        dev_s = total / 1e12 / NITER
        print(f"--- {plane.name} / {line.name}: device {dev_s*1000:.3f} ms/step ---",
              flush=True)
        if step_flops == step_flops:
            print(f"MFU = {step_flops / dev_s / V5E_BF16_PEAK * 100:.1f}% "
                  f"(bf16 peak {V5E_BF16_PEAK/1e12:.0f} TF/s)", flush=True)
        print("category split (ms/step):", flush=True)
        for cat, ps in cats.most_common():
            print(f"  {cat:16s} {ps/1e9/NITER:8.3f}", flush=True)
        print("top 30 ops:", flush=True)
        for k, ps in tot.most_common(30):
            print(f"  {ps/1e6/NITER:8.1f} us x{cnt[k]//NITER:<4d} {k}", flush=True)
print("probe41 done", flush=True)
