"""Round-3 probe C: where does the guidance overhead go?

Guided sampling runs at 0.914x unguided (target >= 0.95); the alignment
net's fused kernels moved it barely (+0.5% vs the XLA alignment path), so
the overhead is NOT attention/FFN math.  Trace both chains (20-step DDPM,
B=1), aggregate per-op device self-times, and print the ops that exist only
in (or grew in) the guided profile.
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


def run(guided, seed):
    kw = dict(timesteps=T)
    if guided:
        kw.update(use_alignment=True, alignment_kwargs={"avg_x_gt": avg})
    return jnp.sum(ld.sample(params["unet"], params["vae"],
                             jax.random.PRNGKey(seed), y1, **kw))


def profile(guided, tag):
    _ = float(np.asarray(run(guided, 0)))
    trace_dir = f"/tmp/jax-trace-{tag}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for i in range(NITER):
        _ = float(np.asarray(run(guided, i + 1)))
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
                m2 = re.match(r"%([a-zA-Z\-_]+)[\.\d]* = ((?:\()?[a-z0-9]+\[[^\]]*\])", nm)
                key = f"{m2.group(1)} {m2.group(2)[:45]}" if m2 else nm[:60]
                tot[key] += ev.duration_ps
                cnt[key] += 1
    total_ms = sum(tot.values()) / 1e9 / NITER
    print(f"{tag}: device {total_ms:.3f} ms per chain ({total_ms/T*1000:.1f} us/step)",
          flush=True)
    return tot, cnt


tot_u, cnt_u = profile(False, "unguided")
tot_g, cnt_g = profile(True, "guided")

print("\n=== ops ranked by (guided - unguided) device time ===", flush=True)
delta = collections.Counter()
for k in set(tot_g) | set(tot_u):
    delta[k] = tot_g.get(k, 0) - tot_u.get(k, 0)
guidance_total = sum(v for v in delta.values() if v > 0)
print(f"guidance-added device time: {guidance_total/1e9/NITER:.3f} ms per chain "
      f"({guidance_total/1e9/NITER/T*1000:.1f} us/step)", flush=True)
for k, ps in delta.most_common(35):
    if ps <= 0:
        break
    print(f"  {ps/1e6/NITER:8.1f} us  x{(cnt_g.get(k,0)-cnt_u.get(k,0))//NITER:<5d} {k}",
          flush=True)
print("probe42 done", flush=True)
