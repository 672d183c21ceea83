"""Round-5 probe (VERDICT r4 #3): guidance_every_k shift-vector fidelity at
V1 SCALE with randomized weights — strengthens the accuracy evidence for the
opt-in k=2 beyond the tiny trained pipeline (guidance_every_k_eval.py).

The k>1 approximation rests on one assumption: the alignment mean-shift
field changes SLOWLY along the reverse chain, so applying k x shift every
k-th step preserves the cumulative shift mass (latent_diffusion.py
_p_sample_step docstring).  This probe measures that directly on the real
v1 architecture (latent 6x16x16x64, 7-frame cond, full-size alignment net),
randomized weights (v1 init zero-inits ffn_2/proj/out_conv — fresh-init
comparisons are vacuous, CLAUDE.md):

  1. adjacent-step shift cosine along the k=1 chain (the smoothness field);
  2. cumulative applied-shift-mass cosine + ratio, k=1 vs k=2 chains run on
     IDENTICAL noise;
  3. final-latent agreement: rel-L2(k2, k1) vs rel-L2(unguided, k1) — the
     approximation error must be small relative to what guidance itself does.

Run on the TPU (v1 scale):  python scripts/probes/guidance_k_shift_cosine.py
CPU smoke (tiny config):    GKSC_TINY=1 GKSC_STEPS=6 JAX_PLATFORMS=cpu python ...
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prediff_tpu.config import prediff_default_config  # noqa: E402
from prediff_tpu.factory import build_pipeline  # noqa: E402

M = int(os.environ.get("GKSC_STEPS", "50"))


def _randomize(params, seed, scale=0.05):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rs = np.random.RandomState(seed)
    leaves = [jnp.asarray(rs.randn(*l.shape).astype(np.float32) * scale)
              for l in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _cos(a, b):
    a = a.reshape(-1).astype(jnp.float32)
    b = b.reshape(-1).astype(jnp.float32)
    return jnp.vdot(a, b) / jnp.maximum(
        jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-30)


def main():
    from prediff_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    print("backend:", jax.default_backend(), flush=True)

    if os.environ.get("GKSC_TINY"):
        from prediff_tpu.config import load_config

        cfg = load_config(prediff_default_config, os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "configs", "tiny_smoke.yaml"))
    else:
        cfg = prediff_default_config()
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                                with_alignment=True)
    unet_params = _randomize(params["unet"], seed=1)
    align_params = _randomize(params["align"], seed=2)
    vae_params = params["vae"]  # VAE init has no zero-init leaves; keep it

    T_in = int(cfg.layout.in_len)
    IMG = int(cfg.layout.img_height)
    y = jnp.asarray(np.random.RandomState(0).rand(
        1, T_in, IMG, IMG, 1).astype(np.float32))
    avg = jnp.full((1, 1), 0.1, jnp.float32)
    align = ld.alignment.replace(params=align_params)
    ts = jnp.arange(M - 1, -1, -1, dtype=jnp.int32)

    def chain(rng, unet_params, align_params, vae_params, k, use_alignment):
        """Reverse chain via ld._p_sample_step; collects shift diagnostics.
        Same rng => identical per-step noise across k values (fold by t).
        Params are ARGUMENTS, not closures: closed-over arrays become HLO
        constants, and at v1 scale the serialized graph then exceeds the
        relay compile endpoint's request-size limit (HTTP 413)."""
        align = ld.alignment.replace(params=align_params)
        zc = ld.cond_stage_forward(vae_params, y)
        rng_init, rng_loop = jax.random.split(rng)
        z0 = jax.random.normal(rng_init, (1,) + ld.latent_shape, jnp.float32)

        def body(carry, t_scalar):
            z, prev_shift, cum = carry
            t_b = jnp.full((1,), t_scalar, jnp.int32)
            shift = align.get_mean_shift(z, t_b, avg, zc=zc, y=y)
            # the mass this chain APPLIES at this step (mirrors
            # _p_sample_step's k-branch: k x shift on steps t % k == 0)
            applied = (shift * float(k) * (t_scalar % k == 0)
                       if k > 1 else shift)
            step_rng = jax.random.fold_in(rng_loop, t_scalar)
            z_next = ld._p_sample_step(
                unet_params, align_params, z, t_b, zc, y, avg, step_rng,
                use_alignment=use_alignment, guidance_every_k=k,
            )
            cosv = _cos(shift, prev_shift)
            return (z_next, shift, cum + applied), cosv

        (z_fin, _, cum), coss = jax.lax.scan(
            body, (z0, jnp.ones_like(z0), jnp.zeros_like(z0)), ts)
        return z_fin, cum, coss

    # one jit per chain (a third of the graph per compile request) with the
    # param trees passed as arguments
    chain_jit = jax.jit(chain, static_argnums=(4, 5))

    def run(rng):
        print("compiling/running k=1 guided chain...", flush=True)
        z1, cum1, cos1 = chain_jit(rng, unet_params, align_params,
                                   vae_params, 1, True)
        z1, cum1, cos1 = map(np.asarray, (z1, cum1, cos1))
        print("compiling/running k=2 guided chain...", flush=True)
        z2, cum2, _ = chain_jit(rng, unet_params, align_params,
                                vae_params, 2, True)
        z2, cum2 = np.asarray(z2), np.asarray(cum2)
        print("compiling/running unguided chain...", flush=True)
        zu, _, _ = chain_jit(rng, unet_params, align_params,
                             vae_params, 1, False)
        zu = np.asarray(zu)
        rel = lambda a, b: (np.linalg.norm((a - b).reshape(-1))  # noqa: E731
                            / max(np.linalg.norm(b.reshape(-1)), 1e-30))
        cosn = lambda a, b: float(_cos(jnp.asarray(a), jnp.asarray(b)))  # noqa: E731
        return dict(
            adj_cos=cos1[1:],                     # drop the prev=ones warmup
            cum_cos=cosn(cum2, cum1),
            cum_ratio=(np.linalg.norm(cum2.reshape(-1))
                       / max(np.linalg.norm(cum1.reshape(-1)), 1e-30)),
            final_cos=cosn(z2, z1),
            rel_k2=rel(z2, z1),
            rel_unguided=rel(zu, z1),
        )

    print(f"compiling (M={M}, 3 chains)...", flush=True)
    out = jax.tree_util.tree_map(np.asarray, run(jax.random.PRNGKey(7)))
    adj = out["adj_cos"]
    print(f"adjacent-step shift cosine (k=1 chain): "
          f"mean {adj.mean():.4f}  min {adj.min():.4f}  p5 "
          f"{np.percentile(adj, 5):.4f}", flush=True)
    print(f"cumulative shift mass: cos(k2, k1) = {out['cum_cos']:.4f}  "
          f"|k2|/|k1| = {out['cum_ratio']:.4f}", flush=True)
    print(f"final latent: cos(k2, k1) = {out['final_cos']:.6f}  "
          f"relL2(k2, k1) = {out['rel_k2']:.3e}  "
          f"relL2(unguided, k1) = {out['rel_unguided']:.3e}", flush=True)
    ratio = out["rel_k2"] / max(out["rel_unguided"], 1e-30)
    print(f"approximation error / guidance effect = {ratio:.3f} "
          f"(<1 means k=2 is closer to k=1 than no-guidance is)", flush=True)
    print("probe done", flush=True)


if __name__ == "__main__":
    main()
