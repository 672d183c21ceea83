"""Round-4 probe: device-side xplane profile of the NEW train step (39.4
samples/s at B=8 latent-cache after the in-kernel param grads; probe68) to
find the next lever.  Rolls device self-time up by (a) attributed source
module from optimized-HLO op_name metadata, (b) op-name prefix for the
unattributed remainder (probe61's method).  PROBE_PHASE=drop0|v1 selects
the config (fresh process each — one-time staging burns in the warmup).
"""
import collections
import glob
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prediff_tpu.config import prediff_default_config  # noqa: E402
from prediff_tpu.factory import build_pipeline  # noqa: E402
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
B, NITER = 8, 10
PHASE = os.environ.get("PROBE_PHASE", "drop0")

cfg = prediff_default_config()
m = cfg.model.latent_model
if PHASE == "drop0":
    m.attn_drop = m.proj_drop = m.ffn_drop = 0.0
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                            with_alignment=False)
rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
enc = jax.jit(lambda v, s: ld._unframes(
    ld.first_stage_moments(v, ld._frames(s)[0]), s.shape[0]))
mx, my = enc(params["vae"], x), enc(params["vae"], y)
tr = DiffusionTrainer(ld, params["vae"],
                      optim_config=dict(lr=1e-4, total_num_steps=1000),
                      prng_impl="auto", conv3d_impl="auto",
                      latent_inputs=True)
state = tr.create_state(params["unet"])
step = tr.make_train_step()

print(f"compiling {PHASE}...", flush=True)
compiled = step.lower(state, jax.random.PRNGKey(0), mx, my).compile()
hlo = compiled.as_text()
# op -> top source tag from op_name metadata (jit(train_step)/<path>)
srcmap = {}
for mm in re.finditer(
        r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo):
    srcmap[mm.group(1)] = mm.group(2)

rng = jax.random.PRNGKey(1)
state, mets = step(state, rng, mx, my)
_ = float(np.asarray(mets["train/loss"]))
for i in range(3):  # extra warmup: burn one-time staging
    state, mets = step(state, jax.random.fold_in(rng, i), mx, my)
_ = float(np.asarray(mets["train/loss"]))

trace_dir = f"/tmp/jax-trace-probe70-{PHASE}"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    state, mets = step(state, jax.random.fold_in(rng, 100 + i), mx, my)
_ = float(np.asarray(mets["train/loss"]))
jax.profiler.stop_trace()

pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

xs = xplane_pb2.XSpace()
with open(pbs[0], "rb") as f:
    xs.ParseFromString(f.read())

tot = collections.Counter()
cnt = collections.Counter()
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    names = {mm.id: mm.name for mm in plane.event_metadata.values()}
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            nm = names[ev.metadata_id].split(" = ")[0].lstrip("%")
            tot[nm] += ev.duration_ps
            cnt[nm] += 1

# subtract the while.N loop-wrapper events (double-count their body)
wrap = {k for k in tot if k.startswith("while")}
wrap_t = sum(tot[k] for k in wrap)
total = sum(tot.values()) - wrap_t
print(f"\n{PHASE}: device total {total/1e9/NITER:.1f} ms/step "
      f"({sum(cnt.values())//NITER} execs; while-wrappers "
      f"{wrap_t/1e9/NITER:.1f} ms excluded)", flush=True)


def srctag(op):
    s = srcmap.get(op)
    if not s:
        return None
    # keep the most informative trailing module path components
    parts = [p for p in s.split("/") if p and not p.startswith("jit(")]
    return "/".join(parts[:3]) if parts else s


by_src = collections.Counter()
by_src_c = collections.Counter()
for k, ps in tot.items():
    if k in wrap:
        continue
    tag = srctag(k)
    if tag is None:
        tag = "<unattr> " + re.sub(r"[.\-]?\d+$", "", k)
    by_src[tag] += ps
    by_src_c[tag] += cnt[k]
print("\ndevice self-time by source region (top 30):", flush=True)
for tag, ps in by_src.most_common(30):
    print(f"  {ps/1e9/NITER:8.3f} ms x{by_src_c[tag]//NITER:<6d} {tag}",
          flush=True)
print("probe70 done", flush=True)
