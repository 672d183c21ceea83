"""Round-3 probe V: is the bench dip (157.3 r2 -> ~142 now) device-real?

Profiles a 100-step B=1 sampling chain (current defaults) and prints total
device ms/step plus the per-component budget to compare against round-2's
5.99 ms (t2d convs 2.3, fused FFN 1.36, v4 attention 1.33, reorder 0.28,
GN 0.13; probe32/35)."""
import sys, os, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

print("backend:", jax.default_backend(), flush=True)
K = 100

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
y = jnp.asarray(np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))


def run(seed):
    out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed),
                    y, timesteps=K, return_decoded=True)
    return jnp.sum(out)


_ = float(np.asarray(run(0)))
print("warmed", flush=True)
trace_dir = "/tmp/jax-trace-samp62"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(3):
    _ = float(np.asarray(run(1 + i)))
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

steps = 3 * K
# drop while-wrapper double counting: subtract the single largest event name
# if it alone is ~half the total (the whole-loop event)
total_ms = sum(tot.values()) / 1e9 / steps
top_name, top_ps = max(tot.items(), key=lambda kv: kv[1])
print(f"raw device total {total_ms*1000:.0f} us/step (incl. possible loop "
      f"wrapper; top single '{top_name}' = {top_ps/1e9/steps*1000:.0f} us/step)",
      flush=True)

# component attribution via optimized-HLO op_name metadata
print("compiling for HLO text (AOT)...", flush=True)
lowered = jax.jit(run).lower(0)
try:
    hlo = lowered.compile().as_text()
except Exception as e:
    print("AOT compile for metadata failed:", e, flush=True)
    hlo = ""
meta = {}
for m in re.finditer(r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo):
    meta[m.group(1)] = m.group(2)
print(f"{len(meta)} ops with metadata", flush=True)

CATS = {
    "conv_t2d/resblock": ("conv3x3x3", "conv_general", "in_layers_2", "out_layers_3"),
    "fused_ffn": ("_try_fused/pallas", "ffn_l",),
    "fused_attn": ("_try_fused_layer", "attn_l"),
    "gn_silu": ("_gn_silu",),
    "vae": ("encoder/", "decoder/"),
    "reorder/copy": ("transpose", "reshape", "copy", "concatenate"),
}
cat = collections.Counter()
for k, ps in tot.items():
    src = meta.get(k, "")
    if not src and k == top_name:
        cat["loop-wrapper"] += ps
        continue
    for c, keys in CATS.items():
        if any(s in src for s in keys):
            cat[c] += ps
            break
    else:
        cat["other" if src else "unattributed"] += ps
print("\ncategory (us/step):", flush=True)
for c, ps in cat.most_common():
    print(f"  {ps/1e9/steps*1000:8.1f} us  {c}", flush=True)
print("probe62 done", flush=True)
