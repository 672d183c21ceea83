"""Fast release gate (<60 s): import smoke + tiny model constructions + one
CPU train step + a short sampling chain.

Round-5 response to VERDICT.md weak #1/#5: commit 67d00ff shipped a
constructor-breaking change under a "comment-only" label because the full
suite takes ~66 min on this 1-core host and no fast tier existed.  This file
is the tier: ``python -m pytest -m fast -q`` must pass before ANY commit that
touches ``prediff_tpu/`` or ``scripts/`` (see CLAUDE.md).  Every test here
constructs the real flagship module classes — a deleted field / renamed kwarg
anywhere in the constructor chain fails within seconds.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.fast


def test_import_smoke():
    """The full public surface imports (catches syntax/import-time errors)."""
    import prediff_tpu  # noqa: F401
    from prediff_tpu import config, serving  # noqa: F401
    from prediff_tpu.models import unet, vae, alignment, cuboid_attention, layers  # noqa: F401
    from prediff_tpu.diffusion import (  # noqa: F401
        latent_diffusion, knowledge_alignment, schedule, core,
    )
    from prediff_tpu.training import (  # noqa: F401
        diffusion_trainer, vae_trainer, alignment_trainer, loop, losses, optim,
    )
    from prediff_tpu.ops import (  # noqa: F401
        pallas_ffn, pallas_attention, pallas_groupnorm, pallas_conv3d,
        pallas_resblock, cuboid, dispatch,
    )
    from prediff_tpu.parallel import mesh  # noqa: F401
    from prediff_tpu.datasets import sevir, synthetic, latents  # noqa: F401
    from prediff_tpu.evaluation import skill_scores, metrics, suite  # noqa: F401
    from prediff_tpu.utils import checkpoint, convert, profiling  # noqa: F401


@pytest.fixture(scope="module")
def tiny():
    """Tiny end-to-end pipeline shared by the gate tests (one init each)."""
    from prediff_tpu.models.unet import CuboidTransformerUNet
    from prediff_tpu.models.vae import AutoencoderKL
    from prediff_tpu.models.alignment import NoisyCuboidTransformerEncoder
    from prediff_tpu.diffusion import LatentDiffusion

    IN_LEN, OUT_LEN, IMG, LAT, LAT_C = 2, 2, 8, 2, 2
    rng = jax.random.PRNGKey(0)

    unet = CuboidTransformerUNet(
        input_shape=(IN_LEN, LAT, LAT, LAT_C),
        target_shape=(OUT_LEN, LAT, LAT, LAT_C),
        base_units=8, depth=[1], block_attn_patterns="full",
        num_heads=2, padding_type="zeros", ffn_activation="gelu",
    )
    unet_params = unet.init(
        rng, jnp.zeros((1, OUT_LEN, LAT, LAT, LAT_C)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, IN_LEN, LAT, LAT, LAT_C)),
    )["params"]

    vae = AutoencoderKL(
        in_channels=1, out_channels=1,
        down_block_types=("DownEncoderBlock2D",) * 3,
        up_block_types=("UpDecoderBlock2D",) * 3,
        block_out_channels=(4, 8, 8), layers_per_block=1,
        latent_channels=LAT_C, norm_num_groups=4,
    )
    vae_params = vae.init(rng, jnp.zeros((1, IMG, IMG, 1)))["params"]

    align = NoisyCuboidTransformerEncoder(
        input_shape=(IN_LEN + OUT_LEN, LAT, LAT, LAT_C),
        out_channels=1, base_units=8, depth=(1, 1), downsample=2,
        block_attn_patterns="full", num_heads=2,
    )
    align_params = align.init(
        rng, jnp.zeros((1, IN_LEN + OUT_LEN, LAT, LAT, LAT_C)),
        jnp.zeros((1,), jnp.int32),
    )["params"]

    ld = LatentDiffusion(
        unet_apply=unet.apply,
        vae_apply_encode=lambda v, x: vae.apply(v, x, method=AutoencoderKL.encode_moments),
        vae_apply_decode=lambda v, z: vae.apply(v, z, method=AutoencoderKL.decode),
        timesteps=3,
        data_shape=(OUT_LEN, IMG, IMG, 1),
        latent_shape=(OUT_LEN, LAT, LAT, LAT_C),
        cond_latent_shape=(IN_LEN, LAT, LAT, LAT_C),
    )
    return dict(ld=ld, unet=unet, vae=vae, align=align,
                unet_params=unet_params, vae_params=vae_params,
                align_params=align_params,
                IN_LEN=IN_LEN, OUT_LEN=OUT_LEN, IMG=IMG, LAT=LAT, LAT_C=LAT_C)


def test_constructors_and_forwards(tiny):
    """UNet / VAE / alignment all construct and run a forward pass — the
    exact failure mode of the round-4 regression (TypeError at build)."""
    B = 1
    z = jnp.zeros((B, tiny["OUT_LEN"], tiny["LAT"], tiny["LAT"], tiny["LAT_C"]))
    cond = jnp.zeros((B, tiny["IN_LEN"], tiny["LAT"], tiny["LAT"], tiny["LAT_C"]))
    out = tiny["unet"].apply({"params": tiny["unet_params"]}, z,
                             jnp.zeros((B,), jnp.int32), cond)
    assert out.shape == z.shape
    img = jnp.zeros((B, tiny["IMG"], tiny["IMG"], 1))
    rec = tiny["vae"].apply({"params": tiny["vae_params"]}, img)[0]
    assert rec.shape == img.shape
    score = tiny["align"].apply(
        {"params": tiny["align_params"]},
        jnp.zeros((B, tiny["IN_LEN"] + tiny["OUT_LEN"],
                   tiny["LAT"], tiny["LAT"], tiny["LAT_C"])),
        jnp.zeros((B,), jnp.int32),
    )
    assert np.all(np.isfinite(np.asarray(score)))


def test_one_train_step(tiny):
    """One jitted diffusion train step runs and yields a finite loss."""
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    trainer = DiffusionTrainer(
        tiny["ld"], tiny["vae_params"],
        optim_config=dict(lr=1e-3, total_num_steps=10, warmup_percentage=0.1),
    )
    state = trainer.create_state(tiny["unet_params"])
    B = 2
    x = jnp.asarray(np.random.RandomState(0).rand(
        B, tiny["OUT_LEN"], tiny["IMG"], tiny["IMG"], 1).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(
        B, tiny["IN_LEN"], tiny["IMG"], tiny["IMG"], 1).astype(np.float32))
    state, metrics = trainer.train_step(state, jax.random.PRNGKey(1), x, y)
    assert np.isfinite(float(metrics["train/loss"]))
    assert int(state.step) == 1


def test_three_step_sample(tiny):
    """The full scanned sampling chain (timesteps=3) produces finite frames."""
    y = jnp.asarray(np.random.RandomState(2).rand(
        1, tiny["IN_LEN"], tiny["IMG"], tiny["IMG"], 1).astype(np.float32))
    out = tiny["ld"].sample(tiny["unet_params"], tiny["vae_params"],
                            jax.random.PRNGKey(3), y)
    assert out.shape == (1, tiny["OUT_LEN"], tiny["IMG"], tiny["IMG"], 1)
    assert np.all(np.isfinite(np.asarray(out)))


def test_graft_entry_contract():
    """__graft_entry__ exposes the driver contract and entry() is buildable."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert callable(mod.entry)
    assert callable(mod.dryrun_multichip)
