"""Round-2 probe: op-level device profile of the bf16 forward (params + input
bf16), to explain why end-to-end bf16 gave only +1% (probe22) when the f32
profile (probe20) looks HBM-bound."""
import sys, os, glob, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.utils.precision import cast_pytree

cfg = prediff_default_config()
rng = jax.random.PRNGKey(0)
ld, params = build_pipeline(cfg, rng=rng, with_alignment=False)
unet16 = cast_pytree(params["unet"], jnp.bfloat16)

B = 1
z = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64), jnp.bfloat16)
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64), jnp.bfloat16)
t_b = jnp.zeros((B,), jnp.int32)

fwd = jax.jit(lambda p, z, t, c: ld.unet_apply({"params": p}, z, t, c))
out = fwd(unet16, z, t_b, zc)
print("warm", float(np.asarray(out, np.float32).sum()), "dtype", out.dtype, flush=True)

NITER = 20
trace_dir = "/tmp/jax-trace-fwd16"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    out = fwd(unet16, out, t_b, zc)
_ = float(np.asarray(out, np.float32).sum())
jax.profiler.stop_trace()

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402
xs = xplane_pb2.XSpace()
pb = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)[0]
with open(pb, "rb") as f:
    xs.ParseFromString(f.read())
import re
for plane in xs.planes:
    if plane.name != "/device:TPU:0":
        continue
    names = {m.id: m.name for m in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name not in ("XLA Modules", "XLA Ops"):
            continue
        tot = collections.Counter(); cnt = collections.Counter()
        for ev in line.events:
            nm = names[ev.metadata_id]
            m = re.match(r"%([a-zA-Z\-_]+)[\.\d]* = ((?:\()?[a-z0-9]+\[[^\]]*\])", nm)
            key = f"{m.group(1)} {m.group(2)[:45]}" if m else nm[:60]
            tot[key] += ev.duration_ps
            cnt[key] += 1
        total = sum(tot.values())
        print(f"--- {line.name}: total {total/1e9/NITER:.3f} ms/iter ---", flush=True)
        if line.name == "XLA Ops":
            for k, ps in tot.most_common(25):
                print(f"  {ps/1e6/NITER:8.1f} us x{cnt[k]//NITER:<4d} {k}", flush=True)
