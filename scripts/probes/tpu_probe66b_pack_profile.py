"""probe66 follow-up: settle the pack_small_thr effect with device-side
xplane totals (probe66's wall A/B sat inside the ±2.6% process drift:
per-leaf 281.4/274.1 ms bracketing pack-64k 272.7).

Traces NITER latent-input B=8 train steps for thr=0 and thr=65536 in one
process and compares total device ms/step, op-execution counts, and the
optimizer/EMA + copy/slice category times.
"""
import sys, os, glob, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

print("backend:", jax.default_backend(), flush=True)
B = 8
NITER = 10

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
rs = np.random.RandomState(0)
x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
enc = jax.jit(lambda v, s: ld._unframes(
    ld.first_stage_moments(v, ld._frames(s)[0]), s.shape[0]))
mx = enc(params["vae"], x)
my = enc(params["vae"], y)

from tensorflow.tsl.profiler.protobuf import xplane_pb2


def device_totals(trace_dir):
    pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
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
    return tot, cnt


for tag, thr in (("per-leaf", 0), ("pack-64k", 65536)):
    tr = DiffusionTrainer(
        ld, params["vae"], optim_config=dict(lr=1e-4, total_num_steps=1000),
        prng_impl="auto", conv3d_impl="auto", latent_inputs=True,
        pack_small_thr=thr,
    )
    state = tr.create_state(params["unet"])
    step = tr.train_step
    state, mets = step(state, jax.random.PRNGKey(1), mx, my)
    _ = float(np.asarray(mets["train/loss"]))
    trace_dir = f"/tmp/jax-trace-pack-{thr}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    for i in range(NITER):
        state, mets = step(state, jax.random.PRNGKey(2 + i), mx, my)
    _ = float(np.asarray(mets["train/loss"]))
    jax.profiler.stop_trace()
    tot, cnt = device_totals(trace_dir)
    # drop the while-loop wrapper double-count (CLAUDE.md protocol)
    wrap_ps = sum(ps for k, ps in tot.items() if k.startswith("while"))
    total_ms = (sum(tot.values()) - wrap_ps) / 1e9 / NITER
    nops = sum(c for k, c in cnt.items() if not k.startswith("while")) // NITER
    copy_ms = sum(ps for k, ps in tot.items()
                  if any(s in k for s in ("copy", "slice", "concatenate"))
                  and not k.startswith("while")) / 1e9 / NITER
    fus_ms = sum(ps for k, ps in tot.items()
                 if k.startswith("fusion") or ".fusion" in k) / 1e9 / NITER
    print(f"{tag:9s}: {total_ms:7.2f} ms device/step, {nops:6d} ops/step, "
          f"copy/slice/concat {copy_ms:6.2f} ms, fusions {fus_ms:7.2f} ms "
          f"[loss {float(mets['train/loss']):.4f}]", flush=True)
print("probe66b done", flush=True)
