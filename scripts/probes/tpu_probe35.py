"""Round-2 probe: forward profile after the in-kernel bias tiling fix
(expect the tile f32[4,R,R] / broadcast ops gone and ~0.4 ms/iter saved
vs probe34's 6.385 ms)."""
import sys, os, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)

B = 1
z = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))
t_b = jnp.zeros((B,), jnp.int32)
fwd = jax.jit(lambda p, z, t, c: ld.unet_apply({"params": p}, z, t, c))
out = fwd(params["unet"], z, t_b, zc)
_ = float(np.asarray(out).sum())
NITER = 20
trace_dir = "/tmp/jax-trace-fwd5"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    out = fwd(params["unet"], out, t_b, zc)
_ = float(np.asarray(out).sum())
jax.profiler.stop_trace()

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402
xs = xplane_pb2.XSpace()
with open(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)[0], "rb") as f:
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
            key = f"{m.group(1)} {m.group(2)[:48]}" if m else nm[:60]
            tot[key] += ev.duration_ps
            cnt[key] += 1
        total = sum(tot.values())
        print(f"--- XLA Ops total {total/1e9/NITER:.3f} ms/iter (probe34 was 6.385) ---",
              flush=True)
        cum = 0
        for k, ps in tot.most_common(20):
            cum += ps
            print(f"  {ps/1e6/NITER:7.1f} us cum{cum/total*100:5.1f}% x{cnt[k]//NITER:<4d} {k}",
                  flush=True)
