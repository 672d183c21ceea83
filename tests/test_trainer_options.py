"""DiffusionTrainer options: remat + scan_unroll sampling equivalence."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.models.unet import CuboidTransformerUNet
from prediff_tpu.models.vae import AutoencoderKL
from prediff_tpu.diffusion import LatentDiffusion
from prediff_tpu.training.diffusion_trainer import DiffusionTrainer


@pytest.fixture(scope="module")
def setup():
    IN_LEN, OUT_LEN, IMG, LAT, LAT_C = 2, 2, 8, 2, 2
    unet = CuboidTransformerUNet(
        input_shape=(IN_LEN, LAT, LAT, LAT_C), target_shape=(OUT_LEN, LAT, LAT, LAT_C),
        base_units=8, depth=[1], block_attn_patterns="full", num_heads=2,
        padding_type="zeros", ffn_activation="gelu",
    )
    vae = AutoencoderKL(
        in_channels=1, out_channels=1,
        down_block_types=("DownEncoderBlock2D",) * 3,
        up_block_types=("UpDecoderBlock2D",) * 3,
        block_out_channels=(4, 8, 8), layers_per_block=1,
        latent_channels=LAT_C, norm_num_groups=4,
    )
    rng = jax.random.PRNGKey(0)
    unet_params = unet.init(rng, jnp.zeros((1, OUT_LEN, LAT, LAT, LAT_C)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, IN_LEN, LAT, LAT, LAT_C)))["params"]
    vae_params = vae.init(rng, jnp.zeros((1, IMG, IMG, 1)))["params"]
    ld = LatentDiffusion(
        unet_apply=unet.apply,
        vae_apply_encode=lambda v, x: vae.apply(v, x, method=AutoencoderKL.encode_moments),
        vae_apply_decode=lambda v, z: vae.apply(v, z, method=AutoencoderKL.decode),
        timesteps=8, data_shape=(OUT_LEN, IMG, IMG, 1),
        latent_shape=(OUT_LEN, LAT, LAT, LAT_C),
        cond_latent_shape=(IN_LEN, LAT, LAT, LAT_C),
        learn_logvar=True,
    )
    x = jnp.asarray(np.random.RandomState(0).rand(2, OUT_LEN, IMG, IMG, 1).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(2, IN_LEN, IMG, IMG, 1).astype(np.float32))
    return ld, unet_params, vae_params, x, y


def test_remat_matches_plain(setup):
    ld, unet_params, vae_params, x, y = setup
    rng = jax.random.PRNGKey(2)
    plain = DiffusionTrainer(ld, vae_params,
                             optim_config=dict(lr=1e-3, total_num_steps=10))
    remat = DiffusionTrainer(ld, vae_params,
                             optim_config=dict(lr=1e-3, total_num_steps=10),
                             remat_unet=True)
    s0 = plain.create_state(unet_params)
    s1 = remat.create_state(unet_params)
    s0, m0 = plain.train_step(s0, rng, x, y)
    s1, m1 = remat.train_step(s1, rng, x, y)
    assert float(m0["train/loss"]) == pytest.approx(float(m1["train/loss"]), rel=1e-5)
    w0 = jax.tree_util.tree_leaves(s0.params)[0]
    w1 = jax.tree_util.tree_leaves(s1.params)[0]
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), rtol=1e-5, atol=1e-6)


def test_scan_unroll_matches(setup):
    ld, unet_params, vae_params, x, y = setup
    rng = jax.random.PRNGKey(3)
    out1 = ld.sample(unet_params, vae_params, rng, y, return_decoded=False)
    out2 = ld.sample(unet_params, vae_params, rng, y, return_decoded=False,
                     scan_unroll=4)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1),
                               rtol=1e-4, atol=1e-5)


def test_conv3d_impl_xla_matches_t2d(setup):
    """optim.conv3d_impl: per-context 3-D conv lowering (probe46/48 — XLA's
    native 3-D conv wins at train shapes, t2d at B=1 sampling shapes).  The
    override must (a) actually change the lowering and (b) be numerically
    the same conv."""
    ld, unet_params, vae_params, x, y = setup
    rng = jax.random.PRNGKey(5)
    t2d = DiffusionTrainer(ld, vae_params,
                           optim_config=dict(lr=1e-3, total_num_steps=10))
    xla = DiffusionTrainer(ld, vae_params,
                           optim_config=dict(lr=1e-3, total_num_steps=10),
                           conv3d_impl="xla")
    # (a) the traced programs differ: the native path emits 3-D SAME-padded
    # conv windows (stride [1,1,1] with pad [1,1] on the leading/temporal
    # spatial dim); t2d only ever pads 2 spatial dims (the 1x1x1 skip conv
    # is 3-D in both but zero-padded, so it doesn't match)
    native3d = "window = {stride = [1, 1, 1], pad = [[1, 1]"
    s0 = t2d.create_state(unet_params)
    hlo_t2d = t2d.make_train_step().lower(s0, rng, x, y).as_text()
    hlo_xla = xla.make_train_step().lower(s0, rng, x, y).as_text()
    assert native3d not in hlo_t2d and "[0, 1, i, o]" in hlo_t2d
    assert native3d in hlo_xla
    # (b) same numbers
    s0 = t2d.create_state(unet_params)
    s1 = xla.create_state(unet_params)
    s0, m0 = t2d.train_step(s0, rng, x, y)
    s1, m1 = xla.train_step(s1, rng, x, y)
    assert float(m0["train/loss"]) == pytest.approx(float(m1["train/loss"]), rel=1e-5)
    w0 = jax.tree_util.tree_leaves(s0.params)[0]
    w1 = jax.tree_util.tree_leaves(s1.params)[0]
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), rtol=1e-4, atol=1e-5)
    # 'auto' resolves at trace time: on CPU it keeps the module default (t2d)
    auto = DiffusionTrainer(ld, vae_params,
                            optim_config=dict(lr=1e-3, total_num_steps=10),
                            conv3d_impl="auto")
    if jax.default_backend() != "tpu":
        hlo_auto = auto.make_train_step().lower(s0, rng, x, y).as_text()
        assert native3d not in hlo_auto


def test_conv3d_impl_auto_batch_gating(setup, monkeypatch):
    """'auto' picks native XLA convs only on TPU with per-device batch >= 8
    (probe49: +3.6% at B=8, -7.6% at B=2)."""
    ld, unet_params, vae_params, x, y = setup
    tr = DiffusionTrainer(ld, vae_params, conv3d_impl="auto")
    assert tr._resolved_conv3d_impl(8) is None  # CPU backend: keep default
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert tr._resolved_conv3d_impl(8) == "xla"
    assert tr._resolved_conv3d_impl(2) is None
    explicit = DiffusionTrainer(ld, vae_params, conv3d_impl="t2d")
    assert explicit._resolved_conv3d_impl(8) == "t2d"


def test_compute_dtype_bf16_sampling(setup):
    ld, unet_params, vae_params, x, y = setup
    import jax.numpy as jnp
    from prediff_tpu.utils.precision import cast_to_bf16

    rng = jax.random.PRNGKey(4)
    out32 = ld.sample(unet_params, vae_params, rng, y)
    p16 = cast_to_bf16({"unet": unet_params, "vae": vae_params})
    out16 = ld.sample(p16["unet"], p16["vae"], rng, y, compute_dtype="bfloat16")
    assert out16.shape == out32.shape
    assert np.isfinite(np.asarray(out16, np.float32)).all()
    # same RNG stream: outputs stay correlated (random tiny weights amplify
    # bf16 divergence across diffusion steps, so the bar is loose)
    corr = np.corrcoef(np.asarray(out16, np.float32).ravel(),
                       np.asarray(out32).ravel())[0, 1]
    assert corr > 0.3


def test_train_step_scan_matches_sequential(setup):
    """make_train_step_scan (round-4): K scanned steps == K sequential
    single-step calls (same outer rng; per-step rng is fold_in(rng,
    state.step) in both paths), and the stacked metrics match the per-step
    metrics.  Tolerance is LSB-scale, not bit-exact: the scan body and the
    standalone step are different compiled programs and XLA may reassociate
    fusions differently."""
    ld, unet_params, vae_params, x, y = setup
    rng = jax.random.PRNGKey(7)
    K = 3
    rs = np.random.RandomState(5)
    xs = jnp.asarray(rs.rand(K, *x.shape).astype(np.float32))
    ys = jnp.asarray(rs.rand(K, *y.shape).astype(np.float32))

    tr = DiffusionTrainer(ld, vae_params,
                          optim_config=dict(lr=1e-3, total_num_steps=10))
    s_seq = tr.create_state(unet_params)
    seq_metrics = []
    for k in range(K):
        s_seq, m = tr.train_step(s_seq, rng, xs[k], ys[k])
        seq_metrics.append(jax.device_get(m))

    s_scan = tr.create_state(unet_params)
    s_scan, mets = tr.train_step_scan(s_scan, rng, xs, ys)
    mets = jax.device_get(mets)

    assert int(s_scan.step) == int(s_seq.step) == K
    for (p_a, p_b) in zip(jax.tree_util.tree_leaves(s_scan.params),
                          jax.tree_util.tree_leaves(s_seq.params)):
        np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b),
                                   rtol=1e-5, atol=1e-8)
    for (e_a, e_b) in zip(jax.tree_util.tree_leaves(s_scan.ema_params),
                          jax.tree_util.tree_leaves(s_seq.ema_params)):
        np.testing.assert_allclose(np.asarray(e_a), np.asarray(e_b),
                                   rtol=1e-5, atol=1e-8)
    for k in range(K):
        for key in seq_metrics[k]:
            np.testing.assert_allclose(
                np.asarray(mets[key][k]), np.asarray(seq_metrics[k][key]),
                rtol=1e-5, atol=1e-8,
                err_msg=f"metric {key} sub-step {k}")
