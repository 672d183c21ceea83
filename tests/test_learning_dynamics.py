"""Learning-dynamics test (round-2 verdict #7): a sign-flipped loss term or a
dead gradient passes every smoke test — this asserts the training loop
actually LEARNS and that what it learned transfers to sampling.

Setup: LatentDiffusion with IDENTITY first stage (latent space == pixel
space, so skill scores are meaningful without a trained VAE), a tiny UNet,
a genuinely noisy 8-step schedule, and a synthetic task whose target is a
fixed bright blob.  After a few hundred steps the train loss must drop
materially and a sampled forecast must beat pure noise on CSI.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.diffusion import LatentDiffusion
from prediff_tpu.models.unet import CuboidTransformerUNet
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer
from prediff_tpu.evaluation.skill_scores import SEVIRSkillScore

T_IN, T_OUT, IMG = 2, 2, 8


def _identity_encode(_params, frames):
    # moments = [mean | logvar]: logvar -> -20 makes sample() == mean == x
    return jnp.concatenate([frames, jnp.full_like(frames, -20.0)], axis=-1)


def _identity_decode(_params, z):
    return z


def _blob_batch(rs, B):
    """Context & target: a fixed bright blob on a dark background (+noise)."""
    img = np.zeros((IMG, IMG), np.float32)
    img[2:5, 3:6] = 0.9
    seq = np.broadcast_to(img, (B, T_IN + T_OUT, IMG, IMG)).copy()
    seq += 0.02 * rs.randn(*seq.shape).astype(np.float32)
    seq = np.clip(seq, 0.0, 1.0)[..., None]
    return jnp.asarray(seq[:, T_IN:]), jnp.asarray(seq[:, :T_IN])  # x, y


@pytest.fixture(scope="module")
def trained():
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
    ld = LatentDiffusion(
        unet_apply=unet.apply,
        vae_apply_encode=lambda v, f: _identity_encode(v, f),
        vae_apply_decode=lambda v, z: _identity_decode(v, z),
        timesteps=8,
        linear_end=0.3,  # abar_7 ~ 0.3: real noise, real denoising signal
        data_shape=(T_OUT, IMG, IMG, 1),
        latent_shape=(T_OUT, IMG, IMG, 1),
        cond_latent_shape=(T_IN, IMG, IMG, 1),
    )
    trainer = DiffusionTrainer(
        ld, vae_params={},
        optim_config=dict(lr=4e-3, total_num_steps=120, warmup_percentage=0.02),
        use_ema=False,
    )
    state = trainer.create_state(unet_params)
    rs = np.random.RandomState(0)
    rng_train = jax.random.PRNGKey(1)
    losses = []
    for _ in range(120):
        x, y = _blob_batch(rs, B=4)
        state, m = trainer.train_step(state, rng_train, x, y)
        losses.append(float(m["train/loss_simple"]))
    return dict(ld=ld, state=state, losses=losses, rs=rs)


def test_train_loss_declines_materially(trained):
    losses = trained["losses"]
    first, last = np.mean(losses[:20]), np.mean(losses[-20:])
    assert np.isfinite(last)
    assert last < 0.75 * first, (first, last)


def test_sampled_forecast_beats_noise_on_csi(trained):
    ld, state, rs = trained["ld"], trained["state"], trained["rs"]
    x, y = _blob_batch(rs, B=4)
    pred = ld.sample(state.params["unet"], {}, jax.random.PRNGKey(2), y)
    pred = jnp.clip(pred, 0.0, 1.0)
    noise = jnp.asarray(
        np.clip(rs.rand(*x.shape), 0.0, 1.0).astype(np.float32)
    )

    def csi(p):
        score = SEVIRSkillScore(threshold_list=(74,), metrics_list=("csi",))
        score.update(p, x)
        return float(np.mean(score.compute()[74]["csi"]))

    csi_pred, csi_noise = csi(pred), csi(noise)
    # the learned forecast concentrates mass on the blob; noise does not
    assert csi_pred > csi_noise + 0.2, (csi_pred, csi_noise)
    # and it must not be a trivial all-ones predictor: MSE beats noise too
    assert float(jnp.mean((pred - x) ** 2)) < float(jnp.mean((noise - x) ** 2))
