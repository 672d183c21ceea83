"""Round-3 probe E: join probe41's train-step profile with HLO op_name
metadata to attribute the mystery fusions (1ms-each vector-grad reductions,
multiply_select dropout fusions) to framework source ops.

Recompiles the SAME train-step program (deterministic fusion naming, the
probe24 workflow), extracts per-fusion op_name/source info from the
optimized HLO, and reprints the profile table from /tmp/jax-trace-train
with source attribution.
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

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
tr = DiffusionTrainer(ld, params["vae"])
x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
state = tr.create_state(params["unet"])

print("compiling for HLO text...", flush=True)
compiled = tr.make_train_step().lower(state, jax.random.PRNGKey(0), x, y).compile()
hlo = compiled.as_text()
print(f"optimized HLO: {len(hlo)} chars", flush=True)

# map %opname -> metadata op_name= path
meta = {}
for m in re.finditer(
    r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo
):
    meta[m.group(1)] = m.group(2)
print(f"{len(meta)} ops with metadata", flush=True)

pbs = glob.glob("/tmp/jax-trace-train/**/*.xplane.pb", recursive=True)
assert pbs, "run tpu_probe41_train_profile.py first (trace missing)"
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

print("top 40 ops with source attribution:", flush=True)
grp = collections.Counter()
for k, ps in tot.most_common(40):
    src = meta.get(k, "?")
    print(f"  {ps/1e6/NITER:8.1f} us x{cnt[k]//NITER:<4d} {full.get(k,'')[:60]}\n"
          f"           -> {src[:150]}", flush=True)
# aggregate by source-path prefix (module level)
for k, ps in tot.items():
    src = meta.get(k, "?")
    # collapse to transpose-kind + top module path elements
    parts = src.split("/")
    tag = "/".join(p for p in parts if not p.startswith("jit(") )[:80]
    grp[tag] += ps
print("\ntop 30 source paths by device time:", flush=True)
for k, ps in grp.most_common(30):
    print(f"  {ps/1e9/NITER:8.3f} ms  {k}", flush=True)
print("probe44 done", flush=True)
