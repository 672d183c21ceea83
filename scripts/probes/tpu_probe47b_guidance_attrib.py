"""Round-3 probe G2: attribute the guidance overhead to source ops.

probe47 (full guided chain) exceeds the relay compile endpoint's request
body limit (HTTP 413), so isolate exactly the guidance-added computation:
``KnowledgeAlignment.get_mean_shift`` (alignment net fwd + bwd) chained in a
lax.scan.  The graph is small enough to AOT-lower for the optimized-HLO
``op_name`` metadata join (probe24/44 workflow), and the scan reproduces the
per-step sequencing the guided sampler sees.

Outputs: device ms/step + op count for the shift alone, and the top source
paths by device self-time — i.e. which alignment-net glue (resblock convs,
patch merge, pos/time embeds, attention pool, GN, transposes) produces the
~420 tiny ops/step the fused kernels don't cover.
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
align = ld.alignment
rs = np.random.RandomState(0)
B = 1
z0 = jnp.asarray(rs.rand(B, *ld.latent_shape).astype(np.float32))
zc = jnp.asarray(rs.rand(B, 7, 16, 16, 64).astype(np.float32))
avg = jnp.full((B, 1), 0.1, jnp.float32)
K = 50
NITER = 5


@jax.jit
def run(z0):
    def body(z, t_scalar):
        t_b = jnp.full((B,), t_scalar, jnp.int32)
        shift = align.get_mean_shift(z, t_b, avg, zc=zc)
        return z + 1e-3 * shift, None

    zf, _ = jax.lax.scan(body, z0, jnp.arange(K, dtype=jnp.int32))
    return jnp.sum(zf)


print("compiling for HLO text...", flush=True)
compiled = run.lower(z0).compile()
hlo = compiled.as_text()
print(f"optimized HLO: {len(hlo)} chars", flush=True)
meta = {}
for m in re.finditer(r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo):
    meta[m.group(1)] = m.group(2)
print(f"{len(meta)} ops with metadata", flush=True)

_ = float(np.asarray(run(z0)))
trace_dir = "/tmp/jax-trace-guided47b"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for _i in range(NITER):
    _ = float(np.asarray(run(z0)))
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
            key = nm.split(" = ")[0].lstrip("%")
            tot[key] += ev.duration_ps
            cnt[key] += 1

steps = NITER * K
total_ms = sum(tot.values()) / 1e9 / steps
print(f"mean-shift: {total_ms*1000:.1f} us device/step, "
      f"{sum(cnt.values())//steps} op executions/step", flush=True)

WRAPPERS = ("jit(", "while", "body", "closed_call", "transpose(jvp(",
            "jvp(NoisyCuboid", "checkpoint")


def tag_of(src, bwd_mark=True):
    parts = src.split("/")
    is_bwd = any(p.startswith("transpose(jvp(") for p in parts)
    parts = [p for p in parts
             if not any(p.startswith(w) for w in WRAPPERS)]
    tag = "/".join(parts[:4])[:88]
    return ("bwd " if is_bwd and bwd_mark else "    ") + tag


grp_t = collections.Counter()
grp_c = collections.Counter()
for k, ps in tot.items():
    grp_t[tag_of(meta.get(k, "?"))] += ps
    grp_c[tag_of(meta.get(k, "?"))] += cnt[k]

print("\ntop 45 source paths by device time (per step):", flush=True)
for k, ps in grp_t.most_common(45):
    print(f"  {ps/1e9/steps*1000:8.1f} us x{grp_c[k]//steps:<5d} {k}", flush=True)
print("probe47b done", flush=True)
