"""Round-4 probe: device xplane profile of the VAE-GAN train step (B=32,
~179 ms, probe72) by source region — is GN+SiLU / conv / disc the
bottleneck, and is there headroom vs the conv roofline?"""
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

from prediff_tpu.config import vae_training_default_config  # noqa: E402
from prediff_tpu.factory import build_vae  # noqa: E402
from prediff_tpu.training.vae_trainer import VAETrainer  # noqa: E402
from prediff_tpu.training.losses import NLayerDiscriminator  # noqa: E402

print("backend:", jax.default_backend(), flush=True)
B, NITER = 32, 6

cfg = vae_training_default_config()
vae = build_vae(cfg)
lc = cfg.model.loss
tr = VAETrainer(
    vae=vae,
    disc=NLayerDiscriminator(input_nc=lc.disc_in_channels,
                             n_layers=lc.disc_num_layers,
                             use_actnorm=lc.use_actnorm),
    disc_start=0, kl_weight=lc.kl_weight, disc_weight=lc.disc_weight,
    disc_factor=lc.disc_factor, disc_loss=lc.disc_loss,
    logvar_init=lc.logvar_init, perceptual_weight=lc.perceptual_weight,
    optim_config=dict(lr=4.5e-6, total_num_steps=10000, betas=(0.5, 0.9),
                      gradient_clip_val=None, lr_scheduler_mode="constant",
                      warmup_percentage=0.0),
)
rng = jax.random.PRNGKey(0)
gs, ds, bs = tr.create_states(rng, jnp.zeros((1, 128, 128, 1)))
x = jnp.asarray(np.random.RandomState(0).rand(B, 128, 128, 1)
                .astype(np.float32))
step = tr.train_step
print("compiling...", flush=True)
lowered = jax.jit(tr.make_train_step()).lower(gs, ds, bs, rng, x)
hlo = lowered.compile().as_text()
srcmap = {}
for mm in re.finditer(
        r"%?([\w\.\-]+) = [^\n]*metadata={op_name=\"([^\"]+)\"", hlo):
    srcmap[mm.group(1)] = mm.group(2)
print(f"{len(srcmap)} ops with metadata", flush=True)
gs, ds, bs, mets = step(gs, ds, bs, rng, x)
_ = float(np.asarray(mets["train/total_loss"]))
for i in range(3):
    gs, ds, bs, mets = step(gs, ds, bs, rng, x)
_ = float(np.asarray(mets["train/total_loss"]))

trace_dir = "/tmp/jax-trace-probe73"
os.system(f"rm -rf {trace_dir}")
jax.profiler.start_trace(trace_dir)
for i in range(NITER):
    gs, ds, bs, mets = step(gs, ds, bs, rng, x)
_ = float(np.asarray(mets["train/total_loss"]))
jax.profiler.stop_trace()

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

pbs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
xs = xplane_pb2.XSpace()
with open(pbs[0], "rb") as f:
    xs.ParseFromString(f.read())

tot = collections.Counter()
cnt = collections.Counter()
meta_src = {}
for plane in xs.planes:
    if "TPU" not in plane.name and "tpu" not in plane.name:
        continue
    names = {m.id: m.name for m in plane.event_metadata.values()}
    # xplane stats sometimes carry tf_op metadata; fall back to op prefix
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            nm = names[ev.metadata_id].split(" = ")[0].lstrip("%")
            tot[nm] += ev.duration_ps
            cnt[nm] += 1

wrap = {k for k in tot if k.startswith("while")}
total = sum(tot.values()) - sum(tot[k] for k in wrap)
print(f"\ndevice total {total/1e9/NITER:.1f} ms/step "
      f"({sum(cnt.values())//NITER} execs)", flush=True)
pre_t = collections.Counter()
pre_c = collections.Counter()
for k, ps in tot.items():
    if k in wrap:
        continue
    p = re.sub(r"[.\-]?\d+$", "", k)
    pre_t[p] += ps
    pre_c[p] += cnt[k]
print("\nby op prefix (top 10):", flush=True)
for p, ps in pre_t.most_common(10):
    print(f"  {ps/1e9/NITER:8.3f} ms x{pre_c[p]//NITER:<6d} {p}", flush=True)


def srctag(op):
    sname = srcmap.get(op)
    if not sname:
        return "<unattr> " + re.sub(r"[.\-]?\d+$", "", op)
    parts = [q for q in sname.split("/") if q and not q.startswith("jit(")]
    return "/".join(parts[:3]) if parts else sname


by_src = collections.Counter()
for k, ps in tot.items():
    if k in wrap:
        continue
    by_src[srctag(k)] += ps
print("\nby source region (top 35):", flush=True)
for tag, ps in by_src.most_common(35):
    print(f"  {ps/1e9/NITER:8.3f} ms  {tag}", flush=True)
print("probe73 done", flush=True)
