"""Round-3 probe U: identify the ~25k unattributed op executions (~22.5 ms,
probe56) in the B=8 train step.  Groups device events by HLO op-name PREFIX
(fusion/copy/dynamic-update-slice/...) and, for ops with metadata, by source;
prints the top unattributed names with counts so we can see whether they are
optimizer per-leaf ops, relayout copies, or profiler artifacts."""
import sys, os, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

print("backend:", jax.default_backend(), flush=True)
B, NITER = 8, 10

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
tr = DiffusionTrainer(ld, params["vae"], prng_impl="rbg", conv3d_impl="auto")
rs = np.random.RandomState(1)
x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
state = tr.create_state(params["unet"])
step = tr.make_train_step()

print("compiling...", flush=True)
compiled = step.lower(state, jax.random.PRNGKey(0), x, y).compile()
hlo = compiled.as_text()
meta = set()
for m in re.finditer(r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo):
    meta.add(m.group(1))
print(f"{len(meta)} ops with metadata in optimized HLO", flush=True)

holder = state
holder, mets = step(holder, jax.random.PRNGKey(1), x, y)
_ = float(np.asarray(mets["train/loss"]))
trace_dir = "/tmp/jax-trace-train61"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    holder, mets = step(holder, jax.random.PRNGKey(2 + i), x, y)
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
            nm = names[ev.metadata_id].split(" = ")[0].lstrip("%")
            tot[nm] += ev.duration_ps
            cnt[nm] += 1

n_attr_t = sum(ps for k, ps in tot.items() if k in meta)
n_unattr = {k: ps for k, ps in tot.items() if k not in meta}
print(f"\ntotal {sum(tot.values())/1e9/NITER:.1f} ms/step over "
      f"{sum(cnt.values())//NITER} executions; "
      f"attributed {n_attr_t/1e9/NITER:.1f} ms, "
      f"unattributed {sum(n_unattr.values())/1e9/NITER:.1f} ms over "
      f"{sum(cnt[k] for k in n_unattr)//NITER} executions", flush=True)

# roll up unattributed by name prefix (strip trailing .N digits)
pre_t = collections.Counter()
pre_c = collections.Counter()
for k, ps in n_unattr.items():
    p = re.sub(r"[.\-]?\d+$", "", k)
    pre_t[p] += ps
    pre_c[p] += cnt[k]
print("\nunattributed by op-name prefix (ms/step x count):", flush=True)
for p, ps in pre_t.most_common(25):
    print(f"  {ps/1e9/NITER:8.3f} ms x{pre_c[p]//NITER:<6d} {p}", flush=True)

print("\ntop 15 single unattributed ops:", flush=True)
for k, ps in sorted(n_unattr.items(), key=lambda kv: -kv[1])[:15]:
    print(f"  {ps/1e9/NITER:8.3f} ms x{cnt[k]//NITER:<4d} {k}", flush=True)
print("probe61 done", flush=True)
