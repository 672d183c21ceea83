"""Round-3 probe A: the custom_vjp kernels on real TPU.

1. guided (PreDiff-KA) sampling with the alignment net now running the fused
   kernels (round-2: locked out, 140.7 steps/s vs 157.3 unguided; target:
   guided >= 0.95 x unguided)
2. on-TPU gradient A/B: train-loss grads and guidance mean-shift with
   kernels on vs off (bf16 tolerance)
3. train step B=2/B=8:
   a. v1 exact config (dropout 0.1 -> kernels off by design, XLA path)
   b. dropout-0 config, kernels OFF vs ON (the honest measurement of the
      custom_vjp kernels' training value)

Timing per CLAUDE.md: chained state/outputs, device-side scalar fetch.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

print("backend:", jax.default_backend(), flush=True)
M = 100


def timeit(tag, fn, n_iter=3, per=1.0):
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(fn(0)))
    t0 = time.perf_counter()
    for i in range(n_iter):
        s = float(np.asarray(fn(i + 1)))
    dt = (time.perf_counter() - t0) / n_iter
    print(f"{tag:30s}: {dt*1000:8.1f} ms  ({per/dt:8.2f} /s)  [chk {s:.4e}]",
          flush=True)
    return dt


def randomized(params, seed=7, scale=0.05):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(seed)
    return jax.tree_util.tree_unflatten(
        treedef,
        [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * scale) for l in leaves],
    )


# ---------------- 1. guided sampling, kernels in the alignment net -------- #
cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=True)
y1 = jnp.asarray(np.random.RandomState(0).rand(1, 7, 128, 128, 1).astype(np.float32))
avg = jnp.full((1, 1), 0.1, jnp.float32)

t_unguided = timeit("unguided B=1 (100 DDPM)", lambda s: jnp.sum(ld.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y1, timesteps=M)),
    per=M)
t_guided = timeit("guided B=1 (100 DDPM)", lambda s: jnp.sum(ld.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y1, timesteps=M,
    use_alignment=True, alignment_kwargs={"avg_x_gt": avg})), per=M)
print(f"guided/unguided throughput ratio: {t_unguided/t_guided:.3f} "
      f"(target >= 0.95)", flush=True)

# off-comparison: alignment on the einsum path (round-2 state)
cfg_off = prediff_default_config()
cfg_off.model.align.model_args.use_pallas_attention = False
cfg_off.model.align.model_args.use_pallas_ffn = False
cfg_off.model.align.model_args.use_pallas_gn = False
ld_off, _ = build_pipeline(cfg_off, rng=jax.random.PRNGKey(0), with_alignment=True)
timeit("guided B=1, align XLA (r2)", lambda s: jnp.sum(ld_off.sample(
    params["unet"], params["vae"], jax.random.PRNGKey(s), y1, timesteps=M,
    use_alignment=True, alignment_kwargs={"avg_x_gt": avg})), per=M)

# --------- 2. on-TPU gradient A/B (kernels on vs off), dropout-0 ---------- #
def build_pair(drop):
    con = prediff_default_config()
    coff = prediff_default_config()
    for c, on in ((con, True), (coff, False)):
        m = c.model.latent_model
        m.attn_drop = m.proj_drop = m.ffn_drop = drop
        if not on:
            m.use_pallas_attention = False
            m.use_pallas_ffn = False
            m.use_pallas_gn = False
    ld_on, p = build_pipeline(con, rng=jax.random.PRNGKey(0), with_alignment=False)
    ld_off, _ = build_pipeline(coff, rng=jax.random.PRNGKey(0), with_alignment=False)
    return ld_on, ld_off, p


ld_on, ld_xla, p0 = build_pair(0.0)
unet_rand = randomized(p0["unet"])
x2 = jnp.asarray(np.random.RandomState(1).rand(2, 6, 128, 128, 1).astype(np.float32))
y2 = jnp.asarray(np.random.RandomState(2).rand(2, 7, 128, 128, 1).astype(np.float32))


def grad_of(ld_):
    def loss(up):
        l, _ = ld_.training_loss(up, ld_.init_logvar(), p0["vae"],
                                 jax.random.PRNGKey(3), x2, y2, train=True)
        return l
    return jax.jit(jax.grad(loss))(unet_rand)


print("computing on-TPU train grads kernels ON vs OFF...", flush=True)
g_on, g_off = grad_of(ld_on), grad_of(ld_xla)
num = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), g_on, g_off)
den = jax.tree_util.tree_map(lambda b: float(jnp.abs(b).max()) + 1e-12, g_off)
rel = max(jax.tree_util.tree_leaves(
    jax.tree_util.tree_map(lambda n, d: n / d, num, den)))
cos_num = sum(float(jnp.vdot(a, b)) for a, b in zip(
    jax.tree_util.tree_leaves(g_on), jax.tree_util.tree_leaves(g_off)))
cos_den = np.sqrt(sum(float(jnp.vdot(a, a)) for a in jax.tree_util.tree_leaves(g_on))) \
    * np.sqrt(sum(float(jnp.vdot(b, b)) for b in jax.tree_util.tree_leaves(g_off)))
print(f"train-grad A/B: max per-leaf rel |diff| {rel:.3e}, "
      f"cosine {cos_num/cos_den:.6f}", flush=True)

# guidance shift A/B on TPU
align_rand = randomized(params["align"], seed=11)
ka_on = ld.alignment.replace(params=align_rand)
ka_off = ld_off.alignment.replace(params=align_rand)
zt = jnp.asarray(np.random.RandomState(5).rand(1, 6, 16, 16, 64).astype(np.float32))
tb = jnp.asarray([500], jnp.int32)
s_on = jax.jit(ka_on.get_mean_shift)(zt, tb, avg)
s_off = jax.jit(ka_off.get_mean_shift)(zt, tb, avg)
d = float(jnp.abs(s_on - s_off).max()) / (float(jnp.abs(s_off).max()) + 1e-12)
print(f"guidance-shift A/B rel |diff| {d:.3e}", flush=True)

# ------------------- 3. train-step throughput ----------------------------- #
def bench_train(tag, ld_, B):
    tr = DiffusionTrainer(ld_, p0["vae"])
    x = jnp.asarray(np.random.RandomState(1).rand(B, 6, 128, 128, 1).astype(np.float32))
    yb = jnp.asarray(np.random.RandomState(2).rand(B, 7, 128, 128, 1).astype(np.float32))
    holder = {"state": tr.create_state(p0["unet"])}

    def run(s):
        for j in range(5):
            holder["state"], metrics = tr.train_step(
                holder["state"], jax.random.PRNGKey(s * 7 + j), x, yb)
        return metrics["train/loss"]
    return timeit(f"{tag} x5 B={B}", run, per=5 * B)


cfg_v1 = prediff_default_config()
ld_v1, _ = build_pipeline(cfg_v1, rng=jax.random.PRNGKey(0), with_alignment=False)
for B in (2, 8):
    bench_train("train v1 (drop .1, XLA)", ld_v1, B)
for B in (2, 8):
    bench_train("train drop0 XLA", ld_xla, B)
for B in (2, 8):
    bench_train("train drop0 KERNELS", ld_on, B)
print("probe40 done", flush=True)
