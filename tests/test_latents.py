"""Latent pre-encoding cache (datasets/latents.py): D4 variant math, cache
write/read, batch-stream parity with the pixel path, and loss equivalence of
the moments-fed trainers."""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.config import prediff_default_config, load_config
from prediff_tpu.datasets import SEVIRDataLoader, SEVIRDataModule, make_synthetic_sevir_lr
from prediff_tpu.datasets.latents import (
    LatentCache,
    apply_d4,
    draw_d4_variant,
    write_latent_cache,
)
from prediff_tpu.factory import build_alignment_model, build_pipeline

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TINY = os.path.join(REPO, "configs", "tiny_smoke.yaml")


def test_d4_mapping_exhaustive():
    """apply_d4 with the (fh, fw, k) -> m*4+j map reproduces every pixel-path
    combination flipH^fh -> flipW^fw -> rot90^k, and uniform (fh, fw, k) is
    uniform over the 8 group elements."""
    x = np.arange(5 * 4 * 6 * 2, dtype=np.float32).reshape(5, 4, 6, 2)
    counts = np.zeros(8, np.int64)
    for fh in (0, 1):
        for fw in (0, 1):
            for k in range(4):
                ref = x.copy()
                if fh:
                    ref = np.flip(ref, axis=1)
                if fw:
                    ref = np.flip(ref, axis=2)
                ref = np.rot90(ref, k=k, axes=(1, 2))
                v = (fh ^ fw) * 4 + (k + 2 * fw) % 4
                counts[v] += 1
                np.testing.assert_array_equal(
                    apply_d4(x, v, h_axis=1, w_axis=2), ref
                )
    assert (counts == 2).all()


def test_draw_d4_variant_matches_pixel_aug():
    """With the same seed, draw_d4_variant selects exactly the element
    augment_seq applies (rng consumption is draw-for-draw identical)."""
    from prediff_tpu.datasets.augmentation import augment_seq

    x = np.random.RandomState(0).rand(3, 8, 8, 1).astype(np.float32)
    rng_pix = np.random.default_rng(123)
    rng_lat = np.random.default_rng(123)
    for _ in range(25):
        pix = augment_seq(x.copy(), "THWC", "2", rng_pix)
        v = draw_d4_variant(rng_lat, "2")
        np.testing.assert_array_equal(apply_d4(x, v, h_axis=1, w_axis=2), pix)
    with pytest.raises(NotImplementedError):
        draw_d4_variant(rng_lat, "1")


@pytest.fixture(scope="module")
def latent_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("latsmoke")
    sevir_dir = str(root / "synthetic_sevirlr")
    make_synthetic_sevir_lr(sevir_dir, num_events=6, H=32, W=32, T=25)
    cfg = load_config(prediff_default_config, TINY)
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0),
                                with_alignment=False)
    vae_params = params["vae"]
    encode = jax.jit(lambda f: ld.first_stage_moments(vae_params, f))
    loader = SEVIRDataLoader(
        data_types=["vil"], seq_len=cfg.dataset.seq_len, raw_seq_len=25,
        sample_mode="sequent", stride=cfg.dataset.stride, batch_size=1,
        layout="NTHWC",
        sevir_catalog=os.path.join(sevir_dir, "CATALOG.csv"),
        sevir_data_dir=os.path.join(sevir_dir, "data"),
        shuffle=False, output_type=np.float32, preprocess=True,
        rescale_method="01",
    )
    cache_path = str(root / "latents.h5")
    write_latent_cache(cache_path, loader, encode, aug="d4",
                       moments_dtype="float32", frame_batch=25)
    loader.close()
    dm = SEVIRDataModule(
        seq_len=cfg.dataset.seq_len, stride=cfg.dataset.stride,
        layout=cfg.dataset.layout, aug_mode="2", dataset_name="sevirlr",
        sevir_dir=sevir_dir, val_ratio=0.2, batch_size=2, seed=3,
    )
    dm.setup()
    return dict(cfg=cfg, ld=ld, params=params, dm=dm,
                cache=LatentCache(cache_path), encode=encode)


def encode_seq(ld, vae_params, x):
    frames, B = ld._frames(jnp.asarray(x))
    return ld._unframes(ld.first_stage_moments(vae_params, frames), B)


def test_latent_batches_match_pixel_batches(latent_setup):
    """A latent epoch yields encode(pixel epoch) batch-for-batch: same window
    order, same D4 element per sample (aug mode '2'), same moments."""
    s = latent_setup
    pix = list(s["dm"].train_batches(0))
    lat = list(s["dm"].train_latent_batches(s["cache"], 0))
    assert len(pix) == len(lat) and len(pix) >= 2
    for b, (mom, fm) in list(zip(pix, lat))[:3]:
        want = np.asarray(encode_seq(s["ld"], s["params"]["vae"], b))
        np.testing.assert_allclose(mom, want, atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(
            fm, b.mean(axis=(2, 3, 4)), atol=1e-6, rtol=1e-6
        )


def test_training_loss_from_moments_matches_pixel(latent_setup):
    s = latent_setup
    cfg, ld = s["cfg"], s["ld"]
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.rand(2, cfg.layout.out_len, 32, 32, 1).astype(np.float32))
    y = jnp.asarray(rs.rand(2, cfg.layout.in_len, 32, 32, 1).astype(np.float32))
    rng = jax.random.PRNGKey(7)
    unet, vae = s["params"]["unet"], s["params"]["vae"]
    logvar = ld.init_logvar()
    loss_pix, dict_pix = jax.jit(
        lambda: ld.training_loss(unet, logvar, vae, rng, x, y, False, "t")
    )()
    mx = encode_seq(ld, vae, x)
    my = encode_seq(ld, vae, y)
    loss_lat, dict_lat = jax.jit(
        lambda: ld.training_loss_from_moments(unet, logvar, rng, mx, my,
                                              False, "t")
    )()
    np.testing.assert_allclose(float(loss_lat), float(loss_pix), rtol=1e-6)
    for k in dict_pix:
        np.testing.assert_allclose(
            float(dict_lat[k]), float(dict_pix[k]), rtol=1e-5, atol=1e-7
        )


def test_diffusion_trainer_latent_step(latent_setup):
    """One latent-fed sharded train step runs and the pixel-input val step
    still works (validation stays pixel-based)."""
    from prediff_tpu.parallel.mesh import make_data_mesh, shard_batch
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    s = latent_setup
    cfg, ld = s["cfg"], s["ld"]
    mesh = make_data_mesh(2)
    tr = DiffusionTrainer(
        ld, s["params"]["vae"], optim_config=dict(lr=1e-3, total_num_steps=4),
        mesh=mesh, latent_inputs=True,
    )
    state = tr.create_state(s["params"]["unet"])
    mom, fm = next(s["dm"].train_latent_batches(s["cache"], 0))
    mom = jnp.asarray(mom)
    mx = shard_batch(mom[:, cfg.layout.in_len:], mesh)
    my = shard_batch(mom[:, :cfg.layout.in_len], mesh)
    state, metrics = tr.train_step(state, jax.random.PRNGKey(0), mx, my)
    assert np.isfinite(float(metrics["train/loss"]))
    rs = np.random.RandomState(2)
    x = shard_batch(jnp.asarray(
        rs.rand(2, cfg.layout.out_len, 32, 32, 1).astype(np.float32)), mesh)
    y = shard_batch(jnp.asarray(
        rs.rand(2, cfg.layout.in_len, 32, 32, 1).astype(np.float32)), mesh)
    val = tr.make_val_step(latent_inputs=False)
    m = val(state, jax.random.PRNGKey(1), x, y)
    assert np.isfinite(float(m["val/loss"]))


def test_alignment_trainer_latent_matches_pixel(latent_setup):
    """The alignment loss from cached moments + cached frame means equals the
    pixel-path loss given the same rng (the architecture ignores y)."""
    from prediff_tpu.models.vae import AutoencoderKL
    from prediff_tpu.training.alignment_trainer import AlignmentTrainer

    s = latent_setup
    cfg, ld = s["cfg"], s["ld"]
    align_model = build_alignment_model(cfg)
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.rand(2, cfg.layout.out_len, 32, 32, 1).astype(np.float32))
    y = jnp.asarray(rs.rand(2, cfg.layout.in_len, 32, 32, 1).astype(np.float32))
    a_params = align_model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.layout.out_len, 4, 4, 8)), jnp.zeros((1,), jnp.int32),
    )["params"]

    def make(latent):
        return AlignmentTrainer(
            model_apply=align_model.apply,
            vae_apply_encode=ld.vae_apply_encode,
            vae_params=s["params"]["vae"],
            timesteps=cfg.model.diffusion.timesteps,
            scale_factor=cfg.model.diffusion.scale_factor,
            latent_inputs=latent,
        )

    rng = jax.random.PRNGKey(11)
    loss_pix, d_pix = make(False)._loss_fn(a_params, rng, x, y, train=False)
    mx = encode_seq(ld, s["params"]["vae"], x)
    my = encode_seq(ld, s["params"]["vae"], y)
    target = x.mean(axis=(2, 3, 4))[..., None]
    loss_lat, d_lat = make(True)._loss_fn(a_params, rng, mx, my, train=False,
                                          target=target)
    np.testing.assert_allclose(float(loss_lat), float(loss_pix), rtol=1e-6)
    np.testing.assert_allclose(
        float(d_lat["relative_mae"]), float(d_pix["relative_mae"]), rtol=1e-5
    )
