"""Round-3 probe T: train-step throughput with cached-latent inputs.

probe56: the frozen VAE encode is ~14% of the B=8 pixel-input train step
(301.6 ms device).  The latent cache (datasets/latents.py) removes it from
the step entirely.  Measures the jitted step, pixel vs latent inputs, at
the v1 dropout-.1 config with shipped defaults (rbg RNG, conv3d 'auto'),
chained 5-step loops with a device-scalar fetch (CLAUDE.md protocol)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

print("backend:", jax.default_backend(), flush=True)
K = 5
NITER = 6

cfg = prediff_default_config()
ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)
rs = np.random.RandomState(0)

for B in (2, 8):
    x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
    enc = jax.jit(lambda v, s: ld._unframes(
        ld.first_stage_moments(v, ld._frames(s)[0]), s.shape[0]))
    mx = enc(params["vae"], x)
    my = enc(params["vae"], y)
    for latent in (False, True):
        tr = DiffusionTrainer(
            ld, params["vae"], optim_config=dict(lr=1e-4, total_num_steps=1000),
            prng_impl="auto", conv3d_impl="auto", latent_inputs=latent,
        )
        state = tr.create_state(params["unet"])
        step = tr.train_step
        a, b = (mx, my) if latent else (x, y)
        holder = state
        rng = jax.random.PRNGKey(1)
        holder, mets = step(holder, rng, a, b)
        _ = float(np.asarray(mets["train/loss"]))
        t0 = time.perf_counter()
        for i in range(NITER):
            for k in range(K):
                holder, mets = step(holder, jax.random.fold_in(rng, i * K + k), a, b)
            _ = float(np.asarray(mets["train/loss"]))
        dt = (time.perf_counter() - t0) / (NITER * K)
        tag = "latent" if latent else "pixel "
        print(f"B={B} {tag}: {dt*1000:7.1f} ms/step  ({B/dt:6.2f} samples/s)"
              f"  [loss {float(mets['train/loss']):.4f}]", flush=True)
print("probe60 done", flush=True)
