"""Round-2 probe: device profile of the FULL sampler chain (one 100-step run)
to locate the ~0.55 ms/step that is neither the bare forward nor the VAE."""
import sys, os, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)

B, M = 1, 100
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))

def run(seed):
    return ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed), y,
                     timesteps=M, return_decoded=True)

out = run(0)
print("warm", float(np.asarray(out, np.float32).sum()), flush=True)

trace_dir = "/tmp/jax-trace-sampler"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
out = run(1)
_ = float(np.asarray(out, np.float32).sum())
jax.profiler.stop_trace()
print("traced", flush=True)

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402
xs = xplane_pb2.XSpace()
pb = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)[0]
with open(pb, "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if plane.name != "/device:TPU:0":
        continue
    names = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        tot = collections.Counter(); cnt = collections.Counter()
        for ev in line.events:
            nm = names[ev.metadata_id]
            m = re.match(r"%([a-zA-Z\-_]+)[\.\d]* = ((?:\()?[a-z0-9]+\[[^\]]*\])", nm)
            key = f"{m.group(1)} {m.group(2)[:50]}" if m else nm[:60]
            tot[key] += ev.duration_ps
            cnt[key] += 1
        total = sum(tot.values())
        print(f"--- XLA Ops total {total/1e9:.2f} ms for one {M}-step chain ---",
              flush=True)
        cum = 0
        for k, ps in tot.most_common(45):
            cum += ps
            print(f"  {ps/1e9:7.3f} ms cum{cum/total*100:5.1f}% x{cnt[k]:<5d} {k}",
                  flush=True)
