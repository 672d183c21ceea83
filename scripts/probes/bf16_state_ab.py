"""Round-5 probe (VERDICT r4 #4): bf16 optimizer/EMA STORAGE dtype A/B.

probe70/78 named f32 opt/EMA HBM traffic as the diffusion train step's
residual cost (48% MFU; params/mu/nu/ema r/w dominate after the latent
cache removed the VAE encode).  The opt-ins under test:

  optim.state_dtype='bfloat16'  -> both Adam moments stored bf16
                                   (training/optim.py::_scale_by_adam_state_dtype)
  optim.ema_dtype='bfloat16'    -> EMA shadow stored bf16
                                   (training/train_state.py, ema.py)

Two modes:
  AB_MODE=speed (default)   v1-scale B=8 latent-cache train step on the TPU.
      Protocol (CLAUDE.md): warmup case first, chained state, fetch per
      TOTAL_STEPS group, f32 anchor re-run LAST to detect relay regime
      shifts (probe78).
  AB_MODE=accuracy          tiny pipeline, N_STEPS with f32 vs bf16 state on
      identical rng/data; reports loss-curve agreement and EMA/param drift.
"""
import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def speed():
    from prediff_tpu.config import prediff_default_config
    from prediff_tpu.factory import build_pipeline
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    print("backend:", jax.default_backend(), flush=True)
    B, TOTAL_STEPS = 8, 24

    cfg = prediff_default_config()
    m = cfg.model.latent_model
    m.attn_drop = m.proj_drop = m.ffn_drop = 0.0
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                                with_alignment=False)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, 6, 128, 128, 1).astype(np.float32))
    y = jnp.asarray(rs.rand(B, 7, 128, 128, 1).astype(np.float32))
    enc = jax.jit(lambda v, s: ld._unframes(
        ld.first_stage_moments(v, ld._frames(s)[0]), s.shape[0]))
    mx, my = enc(params["vae"], x), enc(params["vae"], y)
    rng = jax.random.PRNGKey(1)

    def run_case(tag, state_dtype, ema_dtype, n_groups=3):
        tr = DiffusionTrainer(
            ld, params["vae"],
            optim_config=dict(lr=1e-4, total_num_steps=10000,
                              state_dtype=state_dtype),
            prng_impl="auto", conv3d_impl="auto", latent_inputs=True,
            ema_dtype=ema_dtype,
        )
        state = tr.create_state(params["unet"])
        step = tr.make_train_step()
        print(f"compiling {tag}...", flush=True)
        state, mets = step(state, rng, mx, my)
        _ = float(np.asarray(mets["train/loss"]))
        t0 = time.perf_counter()
        for _ in range(n_groups):
            for _ in range(TOTAL_STEPS):
                state, mets = step(state, rng, mx, my)
            _ = float(np.asarray(mets["train/loss"]))
        dt = (time.perf_counter() - t0) / (n_groups * TOTAL_STEPS)
        print(f"{tag:14s}: {dt*1000:7.1f} ms/step  ({B/dt:6.2f} samples/s)",
              flush=True)
        del state, mets, tr, step
        jax.clear_caches()
        gc.collect()

    CASES = [
        ("warmup", None, None),
        ("f32", None, None),
        ("bf16_opt", "bfloat16", None),
        ("bf16_opt_ema", "bfloat16", "bfloat16"),
        ("f32_anchor", None, None),  # relay regime-shift detector (probe78)
    ]
    want = os.environ.get("AB_CASES")
    for tag, sd, ed in CASES:
        if want and tag not in want.split(","):
            continue
        run_case(tag, sd, ed)
    print("speed A/B done", flush=True)


def accuracy():
    """Tiny-pipeline training-outcome equivalence, f32 vs bf16 state."""
    from prediff_tpu.models.unet import CuboidTransformerUNet
    from prediff_tpu.diffusion import LatentDiffusion
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    N_STEPS = int(os.environ.get("AB_STEPS", "300"))
    T_IN, T_OUT, IMG = 2, 2, 8
    rs = np.random.RandomState(0)

    unet = CuboidTransformerUNet(
        input_shape=(T_IN, IMG, IMG, 1), target_shape=(T_OUT, IMG, IMG, 1),
        base_units=16, depth=[1], block_attn_patterns="axial", num_heads=2,
        padding_type="zeros", ffn_activation="gelu",
    )
    rng = jax.random.PRNGKey(0)
    unet_params = unet.init(
        rng, jnp.zeros((1, T_OUT, IMG, IMG, 1)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T_IN, IMG, IMG, 1)))["params"]
    ld = LatentDiffusion(
        unet_apply=unet.apply,
        vae_apply_encode=lambda v, f: jnp.concatenate(
            [f, jnp.full_like(f, -20.0)], axis=-1),
        vae_apply_decode=lambda v, z: z,
        timesteps=16, linear_end=0.3,
        data_shape=(T_OUT, IMG, IMG, 1), latent_shape=(T_OUT, IMG, IMG, 1),
        cond_latent_shape=(T_IN, IMG, IMG, 1),
    )

    def batch(i):
        r = np.random.RandomState(1000 + i)
        seq = np.zeros((4, T_IN + T_OUT, IMG, IMG), np.float32)
        bright = 0.3 + 0.6 * r.rand(4)
        for b in range(4):
            seq[b, :, 2:5, 3:6] = bright[b]
        seq += 0.02 * r.randn(*seq.shape).astype(np.float32)
        seq = np.clip(seq, 0.0, 1.0)[..., None]
        return jnp.asarray(seq[:, T_IN:]), jnp.asarray(seq[:, :T_IN])

    def train(state_dtype, ema_dtype):
        tr = DiffusionTrainer(
            ld, vae_params={},
            optim_config=dict(lr=2e-3, total_num_steps=N_STEPS,
                              warmup_percentage=0.05,
                              state_dtype=state_dtype),
            ema_dtype=ema_dtype,
        )
        state = tr.create_state(unet_params)
        losses = []
        rng_t = jax.random.PRNGKey(1)
        for i in range(N_STEPS):
            x, y = batch(i)
            state, mets = tr.train_step(state, rng_t, x, y)
            losses.append(float(mets["train/loss"]))
        return state, np.asarray(losses)

    s32, l32 = train(None, None)
    s16, l16 = train("bfloat16", "bfloat16")

    def rel_tree(a, b):
        num = den = 0.0
        for x, z in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            num += float(jnp.sum(jnp.square(x.astype(jnp.float32)
                                            - z.astype(jnp.float32))))
            den += float(jnp.sum(jnp.square(x.astype(jnp.float32))))
        return (num / max(den, 1e-30)) ** 0.5

    tail = slice(N_STEPS - max(N_STEPS // 4, 10), None)
    print(f"steps: {N_STEPS}", flush=True)
    print(f"final-quarter mean loss: f32 {l32[tail].mean():.5f}  "
          f"bf16 {l16[tail].mean():.5f}  "
          f"(rel diff {abs(l32[tail].mean()-l16[tail].mean())/l32[tail].mean():.2e})",
          flush=True)
    print(f"per-step |loss diff| (final quarter): mean "
          f"{np.abs(l32[tail]-l16[tail]).mean():.2e}  max "
          f"{np.abs(l32[tail]-l16[tail]).max():.2e}", flush=True)
    print(f"param relL2(bf16 vs f32):  {rel_tree(s32.params, s16.params):.3e}",
          flush=True)
    print(f"EMA   relL2(bf16 vs f32):  "
          f"{rel_tree(s32.ema_param_tree(), s16.ema_param_tree()):.3e}",
          flush=True)
    # EMA must not freeze: the bf16 shadow must move off its init by about
    # as much as the f32 shadow does
    init_tree = {"unet": unet_params}
    mv16 = rel_tree(s16.ema_param_tree(), init_tree)
    mv32 = rel_tree(s32.ema_param_tree(), init_tree)
    print(f"EMA movement from init: f32 {mv32:.3e}  bf16 {mv16:.3e} "
          f"(0 = frozen shadow)", flush=True)
    print("accuracy A/B done", flush=True)


if __name__ == "__main__":
    from prediff_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    if os.environ.get("AB_MODE", "speed") == "accuracy":
        accuracy()
    else:
        speed()
