"""Round-3 probe G: attribute the guided-sampling overhead (probe42: ~1.07
ms/step, half of it while-loop self-time between tiny ops) to framework
source ops via the optimized-HLO op_name metadata join (probe24/44 workflow).

Profiles the GUIDED chain only and groups device self-time AND op counts by
source path; alignment-net modules are identifiable by name, so this tells
us exactly which glue (resblock convs, patch-merge, pos/time embed,
attention-pool, GN, and their transposes) produces the ~420 tiny ops/step
that the existing fused kernels don't cover.
"""
import sys, os, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

print("backend:", jax.default_backend(), flush=True)
cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=True)
y1 = jnp.asarray(np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))
avg = jnp.full((1, 1), 0.1, jnp.float32)
T = 20
NITER = 5


@jax.jit
def run(seed):
    return jnp.sum(ld.sample(params["unet"], params["vae"],
                             jax.random.PRNGKey(seed), y1, timesteps=T,
                             use_alignment=True,
                             alignment_kwargs={"avg_x_gt": avg}))


print("compiling for HLO text...", flush=True)
compiled = run.lower(0).compile()
hlo = compiled.as_text()
print(f"optimized HLO: {len(hlo)} chars", flush=True)
meta = {}
for m in re.finditer(r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo):
    meta[m.group(1)] = m.group(2)
print(f"{len(meta)} ops with metadata", flush=True)

_ = float(np.asarray(run(0)))
trace_dir = "/tmp/jax-trace-guided47"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    _ = float(np.asarray(run(i + 1)))
jax.profiler.stop_trace()

pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = xplane_pb2.XSpace()
with open(pbs[0], "rb") as f:
    xs.ParseFromString(f.read())

tot = collections.Counter()
cnt = collections.Counter()
full = {}
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
            full[key] = nm[:80]

total_ms = sum(tot.values()) / 1e9 / NITER
print(f"guided chain: {total_ms:.3f} ms device, {sum(cnt.values())//NITER} op "
      f"executions per chain ({sum(cnt.values())//NITER//T}/step)", flush=True)

grp_t = collections.Counter()
grp_c = collections.Counter()
for k, ps in tot.items():
    src = meta.get(k, "?")
    parts = src.split("/")
    # keep transpose() wrappers, drop jit()/jvp() wrappers, keep 3 segments
    parts = [p for p in parts if not p.startswith("jit(")]
    tag = "/".join(parts[:4])[:95]
    grp_t[tag] += ps
    grp_c[tag] += cnt[k]

print("\ntop 45 source paths by device time (per chain):", flush=True)
for k, ps in grp_t.most_common(45):
    print(f"  {ps/1e9/NITER:8.3f} ms x{grp_c[k]//NITER:<6d} {k}", flush=True)
print("probe47 done", flush=True)
