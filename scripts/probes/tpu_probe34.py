"""Round-2 probe: (a) elementwise on-TPU equivalence of the full forecast
with all fused kernels vs pure-XLA path; (b) fresh op profile of the
all-kernels forward.

NOTE: params are RANDOMIZED over every leaf.  The v1 init zero-initializes
ffn_2 / attention proj / out_conv (linear_init mode "2"), which makes a
fresh-init comparison vacuous — those paths output constants and any kernel
difference is multiplied by zero."""
import sys, os, glob, collections, re
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

B, M = 1, 100
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))

outs = {}
pipes = {}
for tag, on in [("xla", False), ("pallas", True)]:
    cfg = prediff_default_config()
    cfg.model.latent_model.use_pallas_attention = "layer" if on else False
    cfg.model.latent_model.use_pallas_ffn = on
    cfg.model.latent_model.use_pallas_gn = on
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
    leaves, treedef = jax.tree_util.tree_flatten(params["unet"])
    rs = np.random.RandomState(7)
    leaves = [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * 0.05)
              for l in leaves]
    params = dict(params, unet=jax.tree_util.tree_unflatten(treedef, leaves))
    pipes[tag] = (ld, params)
    out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(7), y,
                    timesteps=M, return_decoded=True)
    outs[tag] = np.asarray(out, np.float32)
    print(tag, "done", flush=True)

a, b = outs["xla"], outs["pallas"]
print(f"max|diff| {np.abs(a - b).max():.3e}  rms {np.sqrt(((a-b)**2).mean()):.3e}  "
      f"out rms {np.sqrt((a**2).mean()):.3e}  corr "
      f"{np.corrcoef(a.ravel(), b.ravel())[0,1]:.6f}", flush=True)

# ---- profile the all-kernels forward ------------------------------------- #
ld, params = pipes["pallas"]
z = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))
t_b = jnp.zeros((B,), jnp.int32)
fwd = jax.jit(lambda p, z, t, c: ld.unet_apply({"params": p}, z, t, c))
out = fwd(params["unet"], z, t_b, zc)
_ = float(np.asarray(out).sum())
NITER = 20
trace_dir = "/tmp/jax-trace-fwd4"
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
        print(f"--- XLA Ops total {total/1e9/NITER:.3f} ms/iter ---", flush=True)
        cum = 0
        for k, ps in tot.most_common(30):
            cum += ps
            print(f"  {ps/1e6/NITER:7.1f} us cum{cum/total*100:5.1f}% x{cnt[k]//NITER:<4d} {k}",
                  flush=True)
