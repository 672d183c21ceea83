"""Round-2 probe: op-level profile of the CURRENT forward (t2d convs default).

After the Conv3x3x3 temporal decomposition (8.57 ms forward, 111.6 steps/s
headline), re-rank ops by device self time to find the next lever.
Parses the xplane.pb directly (XSpace proto): aggregates event durations per
line on the TPU device plane.
"""
import sys, os, glob, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)

B = 1
z = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))
t_b = jnp.zeros((B,), jnp.int32)

fwd = jax.jit(lambda p, z, t, c: ld.unet_apply({"params": p}, z, t, c))
out = fwd(params["unet"], z, t_b, zc)
print("warm", float(np.asarray(out).sum()), flush=True)

NITER = 20
trace_dir = "/tmp/jax-trace-fwd3"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    out = fwd(params["unet"], out, t_b, zc)
_ = float(np.asarray(out).sum())
jax.profiler.stop_trace()
print("traced", flush=True)

pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print(pbs, flush=True)

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

xs = xplane_pb2.XSpace()
with open(pbs[0], "rb") as f:
    xs.ParseFromString(f.read())

for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    print(f"\n=== plane: {plane.name} ===", flush=True)
    names = dict(plane.event_metadata)
    for line in plane.lines:
        tot = collections.Counter()
        cnt = collections.Counter()
        for ev in line.events:
            nm = names[ev.metadata_id].name
            tot[nm] += ev.duration_ps
            cnt[nm] += 1
        if not tot:
            continue
        total = sum(tot.values())
        print(f"--- line: {line.name}  total {total/1e12*1000:.2f} ms "
              f"({total/1e12*1000/NITER:.3f} ms/iter) ---", flush=True)
        for nm, ps in tot.most_common(25):
            print(f"  {ps/1e12*1000/NITER*1000:9.1f} us/iter  x{cnt[nm]//NITER:<4d} {nm[:110]}",
                  flush=True)
