"""probe83: device-side xplane profile of the sampling chain at B=1 vs B=8.

probe81 measured aggregate batch scaling saturating at ~1.4-1.6x (B=4) with
an unstable relay window.  Wall numbers through the relay drift; xplane
device self-times do not.  This probe answers, from device truth:
  1. what is the real per-step device time at B=1 vs B=8?
  2. which source regions scale super-linearly with batch (the saturators)?

Protocol (CLAUDE.md): one process; B=1 runs first and doubles as the warmup
burn for one-time staging (its absolute number is still xplane-derived, so
staging only pollutes the first WALL call, not device self-time); while.N
loop-wrapper events are subtracted (they double-count their body).
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

print("backend:", jax.default_backend(), flush=True)
M, NITER = 100, 2
cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                            with_alignment=False)


def make_fn(B):
    y = jnp.asarray(np.random.RandomState(0).rand(
        B, 7, 128, 128, 1).astype(np.float32))

    @jax.jit
    def run(up, vp, s):
        return jnp.sum(ld.sample(up, vp, jax.random.PRNGKey(s), y,
                                 timesteps=M, return_decoded=True))
    return run, y


def profile(B):
    run, _ = make_fn(B)
    print(f"compiling B={B}...", flush=True)
    compiled = run.lower(params["unet"], params["vae"], 0).compile()
    srcmap = {}
    for mm in re.finditer(
            r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"",
            compiled.as_text()):
        srcmap[mm.group(1)] = mm.group(2)
    _ = float(np.asarray(run(params["unet"], params["vae"], 0)))  # warm+stage
    trace_dir = f"/tmp/jax-trace-probe83-b{B}"
    os.system(f"rm -rf {trace_dir}")
    jax.profiler.start_trace(trace_dir)
    s = 0.0
    for i in range(NITER):
        s += float(np.asarray(run(params["unet"], params["vae"], i + 1)))
    jax.profiler.stop_trace()
    print(f"B={B} chk {s:.4e}", flush=True)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)[0],
              "rb") as f:
        xs.ParseFromString(f.read())
    tot, cnt = collections.Counter(), collections.Counter()
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
    wrap = {k for k in tot if k.startswith("while")}
    total = sum(tot.values()) - sum(tot[k] for k in wrap)

    def srctag(op):
        sm = srcmap.get(op)
        if not sm:
            return "<unattr> " + re.sub(r"[.\-]?\d+$", "", op)
        parts = [p for p in sm.split("/") if p and not p.startswith("jit(")]
        return "/".join(parts[:3]) if parts else sm

    by_src = collections.Counter()
    for k, ps in tot.items():
        if k not in wrap:
            by_src[srctag(k)] += ps
    per_chain = total / 1e9 / NITER
    print(f"B={B}: device {per_chain:.1f} ms/chain "
          f"({per_chain / M * 1000:.0f} us/step incl. decode)", flush=True)
    return per_chain, by_src


t1, src1 = profile(1)
t8, src8 = profile(8)
print(f"\ndevice scaling: B=8 chain {t8:.1f} ms vs B=1 {t1:.1f} ms -> "
      f"{t8 / t1:.2f}x time for 8x work = {8 * t1 / t8:.2f}x ideal "
      f"aggregate scaling", flush=True)
print("\ntop regions at B=8 (ms/chain, B1 ms, B8/B1 ratio):", flush=True)
for tag, ps in src8.most_common(25):
    ms8 = ps / 1e9 / NITER
    ms1 = src1.get(tag, 0) / 1e9 / NITER
    r = ms8 / ms1 if ms1 else float("inf")
    print(f"  {ms8:8.2f}  {ms1:8.2f}  x{r:5.2f}  {tag}", flush=True)
print("probe83 done", flush=True)
