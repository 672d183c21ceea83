"""guidance_every_k accuracy evaluation (VERDICT r3 #6) — CPU, ~15 min.

Trains the learning-dynamics tiny pipeline (identity first stage, bright-blob
task) AND a tiny avg-x alignment net, then samples guided forecasts at
k in {1, 2, 4} (+ unguided) with the demonstration knowledge
avg_x_gt = 2x target mean (ref train_sevirlr_prediff.py:48-67), comparing

  * |mean-intensity(pred) - avg_x_gt|  — the quantity guidance controls;
  * CSI@74 vs the target                — does skipping steps hurt skill?

Interpretation: k is SEMANTICS-PRESERVING-ish if the guided intensity pull
stays within noise of k=1 while CSI doesn't degrade.  The steps/s side of
the trade is measured on the TPU by tpu_probe69_guidance_k.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prediff_tpu.diffusion import LatentDiffusion  # noqa: E402
from prediff_tpu.diffusion.knowledge_alignment import (  # noqa: E402
    KnowledgeAlignment,
)
from prediff_tpu.models.alignment import (  # noqa: E402
    NoisyCuboidTransformerEncoder,
)
from prediff_tpu.models.unet import CuboidTransformerUNet  # noqa: E402
from prediff_tpu.training.alignment_trainer import AlignmentTrainer  # noqa: E402
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer  # noqa: E402
from prediff_tpu.evaluation.skill_scores import SEVIRSkillScore  # noqa: E402

T_IN, T_OUT, IMG = 2, 2, 8
TIMESTEPS = 16


def _identity_encode(_params, frames):
    return jnp.concatenate([frames, jnp.full_like(frames, -20.0)], axis=-1)


def _blob_batch(rs, B, bright):
    """Blob whose BRIGHTNESS varies per sample — so mean intensity is a
    meaningful guidance target rather than a constant."""
    seq = np.zeros((B, T_IN + T_OUT, IMG, IMG), np.float32)
    for b in range(B):
        seq[b, :, 2:5, 3:6] = bright[b]
    seq += 0.02 * rs.randn(*seq.shape).astype(np.float32)
    seq = np.clip(seq, 0.0, 1.0)[..., None]
    return jnp.asarray(seq[:, T_IN:]), jnp.asarray(seq[:, :T_IN])


def main():
    from prediff_tpu.utils.platform import respect_jax_platforms_env

    respect_jax_platforms_env()
    rs = np.random.RandomState(0)

    unet = CuboidTransformerUNet(
        input_shape=(T_IN, IMG, IMG, 1), target_shape=(T_OUT, IMG, IMG, 1),
        base_units=8, depth=[1], block_attn_patterns="axial", num_heads=2,
        padding_type="zeros", ffn_activation="gelu",
    )
    rng = jax.random.PRNGKey(0)
    unet_params = unet.init(
        rng, jnp.zeros((1, T_OUT, IMG, IMG, 1)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, T_IN, IMG, IMG, 1)),
    )["params"]
    align_net = NoisyCuboidTransformerEncoder(
        input_shape=(T_OUT, IMG, IMG, 1), out_channels=1, base_units=8,
        depth=[1], block_attn_patterns="axial", num_heads=2,
        padding_type="zeros", ffn_activation="gelu", readout_seq=True,
        out_len=T_OUT,
    )
    align_params = align_net.init(
        rng, jnp.zeros((1, T_OUT, IMG, IMG, 1)), jnp.zeros((1,), jnp.int32),
    )["params"]

    ld = LatentDiffusion(
        unet_apply=unet.apply,
        vae_apply_encode=_identity_encode,
        vae_apply_decode=lambda v, z: z,
        timesteps=TIMESTEPS, linear_end=0.3,
        data_shape=(T_OUT, IMG, IMG, 1), latent_shape=(T_OUT, IMG, IMG, 1),
        cond_latent_shape=(T_IN, IMG, IMG, 1),
    )

    # ---- train the denoiser --------------------------------------------- #
    tr = DiffusionTrainer(
        ld, vae_params={},
        optim_config=dict(lr=4e-3, total_num_steps=300, warmup_percentage=0.02),
        use_ema=False,
    )
    state = tr.create_state(unet_params)
    rng_train = jax.random.PRNGKey(1)
    for i in range(300):
        bright = 0.3 + 0.6 * rs.rand(4)
        x, y = _blob_batch(rs, 4, bright)
        state, m = tr.train_step(state, jax.random.fold_in(rng_train, i), x, y)
    print(f"diffusion trained: loss {float(m['train/loss_simple']):.4f}",
          flush=True)

    # ---- train the alignment net (avg-x regression from noisy latents) -- #
    atr = AlignmentTrainer(
        model_apply=align_net.apply,
        vae_apply_encode=_identity_encode,
        vae_params={},
        schedule=ld.schedule,
        optim_config=dict(lr=4e-3, total_num_steps=400,
                          warmup_percentage=0.02),
    )
    astate = atr.create_state(align_params)
    for i in range(400):
        bright = 0.3 + 0.6 * rs.rand(4)
        x, y = _blob_batch(rs, 4, bright)
        astate, am = atr.train_step(astate, jax.random.fold_in(rng, i), x, y)
    print(f"alignment trained: loss {float(am['train_loss']):.5f} "
          f"rel_mae {float(am.get('train_relative_mae', am.get('relative_mae', float('nan')))):.4f}",
          flush=True)

    # ---- guided sampling at k in {1,2,4} --------------------------------- #
    ld.alignment = KnowledgeAlignment(
        params=astate.params, guide_scale=float(os.environ.get('GK_SCALE', 300.0)),
        apply_fn=lambda v, zt, t, zc=None, y=None: align_net.apply(v, zt, t),
    )
    B = 8
    bright = 0.3 + 0.6 * rs.rand(B)
    x, y = _blob_batch(rs, B, bright)
    gt = jnp.asarray(
        np.asarray(x).reshape(B, -1).mean(axis=1, keepdims=True) * 2.0
    )  # 2x GT mean (demonstration knowledge)

    def evaluate(tag, **kw):
        pred = ld.sample(state.params["unet"], {}, jax.random.PRNGKey(9), y,
                         **kw)
        pred = jnp.clip(pred, 0.0, 1.0)
        mean_int = np.asarray(pred).reshape(B, -1).mean(axis=1, keepdims=True)
        pull = float(np.abs(mean_int - np.asarray(gt)).mean())
        score = SEVIRSkillScore(threshold_list=(74,), metrics_list=("csi",))
        score.update(pred, x)
        csi = float(np.mean(score.compute()[74]["csi"]))
        print(f"{tag:12s}: mean {float(mean_int.mean()):.4f} "
              f"(gt {float(np.asarray(gt).mean()):.4f})  "
              f"|mean - 2x_gt| {pull:.4f}   csi@74 {csi:.4f}",
              flush=True)
        return pull, csi

    evaluate("unguided")
    base_pull, base_csi = evaluate(
        "guided k=1", use_alignment=True,
        alignment_kwargs={"avg_x_gt": gt})
    for k in (2, 4):
        pull, csi = evaluate(
            f"guided k={k}", use_alignment=True,
            alignment_kwargs={"avg_x_gt": gt}, guidance_every_k=k)
        print(f"  k={k} deltas: pull {pull - base_pull:+.4f} "
              f"csi {csi - base_csi:+.4f}", flush=True)
    print("guidance_every_k_eval done", flush=True)


if __name__ == "__main__":
    main()
