"""Training-stack tests: EMA, schedules, and all three jitted train loops on
an 8-virtual-device CPU mesh (data-parallel, the reference's DDP equivalent)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.training.ema import ema_update, ema_decay
from prediff_tpu.training.optim import build_lr_schedule
from prediff_tpu.parallel.mesh import make_mesh, shard_batch


def test_ema_decay_ramp():
    assert float(ema_decay(0.9999, jnp.asarray(0))) == pytest.approx(1 / 10)
    assert float(ema_decay(0.9999, jnp.asarray(90))) == pytest.approx(91 / 100)
    assert float(ema_decay(0.9999, jnp.asarray(10**6))) == pytest.approx(0.9999)
    assert float(ema_decay(0.9999, jnp.asarray(-1))) == pytest.approx(0.9999)


def test_ema_update_matches_reference_formula():
    shadow = {"w": jnp.asarray([1.0, 2.0])}
    params = {"w": jnp.asarray([3.0, 4.0])}
    n = 5
    d = min(0.9999, (1 + n) / (10 + n))
    new = ema_update(shadow, params, 0.9999, n)
    expected = np.asarray([1.0, 2.0]) - (1 - d) * (np.asarray([1.0, 2.0]) - np.asarray([3.0, 4.0]))
    np.testing.assert_allclose(np.asarray(new["w"]), expected, rtol=1e-6)


def test_lr_schedule_warmup_cosine():
    sch = build_lr_schedule(1e-3, total_num_steps=1000, warmup_percentage=0.1,
                            min_lr_ratio=1e-3, warmup_min_lr_ratio=0.1)
    assert float(sch(0)) == pytest.approx(1e-4)
    assert float(sch(100)) == pytest.approx(1e-3, rel=1e-3)
    assert float(sch(1000)) == pytest.approx(1e-6, rel=1e-2)
    # monotonic up then down
    vals = [float(sch(i)) for i in range(0, 1001, 50)]
    peak = int(np.argmax(vals))
    assert all(vals[i] <= vals[i + 1] + 1e-12 for i in range(peak))
    assert all(vals[i] >= vals[i + 1] - 1e-12 for i in range(peak, len(vals) - 1))


@pytest.fixture(scope="module")
def tiny_setup():
    from prediff_tpu.models.unet import CuboidTransformerUNet
    from prediff_tpu.models.vae import AutoencoderKL
    from prediff_tpu.diffusion import LatentDiffusion

    IN_LEN, OUT_LEN, IMG, LAT, LAT_C = 2, 2, 8, 2, 2
    unet = CuboidTransformerUNet(
        input_shape=(IN_LEN, LAT, LAT, LAT_C),
        target_shape=(OUT_LEN, LAT, LAT, LAT_C),
        base_units=8, depth=[1], block_attn_patterns="full",
        num_heads=2, padding_type="zeros", ffn_activation="gelu",
    )
    vae = AutoencoderKL(
        in_channels=1, out_channels=1,
        down_block_types=("DownEncoderBlock2D",) * 3,
        up_block_types=("UpDecoderBlock2D",) * 3,
        block_out_channels=(4, 8, 8), layers_per_block=1,
        latent_channels=LAT_C, norm_num_groups=4,
    )
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, OUT_LEN, LAT, LAT, LAT_C))
    unet_params = unet.init(rng, x0, jnp.zeros((2,), jnp.int32),
                            jnp.zeros((2, IN_LEN, LAT, LAT, LAT_C)))["params"]
    vae_params = vae.init(rng, jnp.zeros((2, IMG, IMG, 1)))["params"]
    ld = LatentDiffusion(
        unet_apply=unet.apply,
        vae_apply_encode=lambda v, x: vae.apply(v, x, method=AutoencoderKL.encode_moments),
        vae_apply_decode=lambda v, z: vae.apply(v, z, method=AutoencoderKL.decode),
        timesteps=10,
        data_shape=(OUT_LEN, IMG, IMG, 1),
        latent_shape=(OUT_LEN, LAT, LAT, LAT_C),
        cond_latent_shape=(IN_LEN, LAT, LAT, LAT_C),
        learn_logvar=True,
    )
    return dict(ld=ld, unet=unet, vae=vae, unet_params=unet_params,
                vae_params=vae_params, IN_LEN=IN_LEN, OUT_LEN=OUT_LEN, IMG=IMG,
                LAT=LAT, LAT_C=LAT_C)


def test_diffusion_train_step_sharded(tiny_setup):
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    assert jax.device_count() == 8
    mesh = make_mesh()
    trainer = DiffusionTrainer(
        tiny_setup["ld"], tiny_setup["vae_params"],
        optim_config=dict(lr=1e-3, total_num_steps=100, warmup_percentage=0.1),
        mesh=mesh,
    )
    state = trainer.create_state(tiny_setup["unet_params"])
    rng = jax.random.PRNGKey(1)
    B = 16
    x = shard_batch(jnp.asarray(np.random.RandomState(0).rand(
        B, tiny_setup["OUT_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32)), mesh)
    y = shard_batch(jnp.asarray(np.random.RandomState(1).rand(
        B, tiny_setup["IN_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32)), mesh)
    losses = []
    for _ in range(5):
        state, metrics = trainer.train_step(state, rng, x, y)
        losses.append(float(metrics["train/loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 5
    # EMA shadow differs from live params after updates
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, state.ema_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    # val step runs with EMA params
    metrics = trainer.val_step(state, rng, x, y)
    assert np.isfinite(float(metrics["val/loss"]))


def test_flat_update_matches_per_leaf(tiny_setup):
    """flat_update=True (one raveled clip/adam/EMA kernel) is semantically
    identical to the per-leaf optax path: after 3 steps params, EMA and the
    logged grad_norm agree to f32 tolerance (only the global-norm reduction
    order differs)."""
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    x = jnp.asarray(np.random.RandomState(0).rand(
        2, tiny_setup["OUT_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(
        2, tiny_setup["IN_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32))

    def run(flat):
        tr = DiffusionTrainer(
            tiny_setup["ld"], tiny_setup["vae_params"],
            optim_config=dict(lr=1e-3, total_num_steps=10,
                              gradient_clip_val=1e-3),  # make clip scale bite
            flat_update=flat,
        )
        state = tr.create_state(tiny_setup["unet_params"])
        norms = []
        for _ in range(3):
            state, m = tr.train_step(state, jax.random.PRNGKey(0), x, y)
            norms.append(float(m["grad_norm"]))
        return state, norms

    s_flat, n_flat = run(True)
    s_leaf, n_leaf = run(False)
    np.testing.assert_allclose(n_flat, n_leaf, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_flat.params),
                    jax.tree_util.tree_leaves(s_leaf.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)
    for a, b in zip(jax.tree_util.tree_leaves(s_flat.ema_params),
                    jax.tree_util.tree_leaves(s_leaf.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)


def test_pack_small_thr_matches_per_leaf(tiny_setup):
    """pack_small_thr (small leaves packed into one flat optimizer/EMA
    vector, big leaves native) is semantically identical to the per-leaf
    path: after 3 steps params, EMA (via ema_param_tree) and grad_norm
    agree to f32 tolerance (only the global-norm reduction order differs).
    Also pins that EMA really is STORED packed and that pack/unpack
    round-trips the tree exactly."""
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    x = jnp.asarray(np.random.RandomState(0).rand(
        2, tiny_setup["OUT_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(
        2, tiny_setup["IN_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32))

    def run(thr):
        tr = DiffusionTrainer(
            tiny_setup["ld"], tiny_setup["vae_params"],
            optim_config=dict(lr=1e-3, total_num_steps=10,
                              gradient_clip_val=1e-3),  # make clip scale bite
            pack_small_thr=thr,
        )
        state = tr.create_state(tiny_setup["unet_params"])
        norms = []
        for _ in range(3):
            state, m = tr.train_step(state, jax.random.PRNGKey(0), x, y)
            norms.append(float(m["grad_norm"]))
        return state, norms

    s_pack, n_pack = run(4096)
    s_leaf, n_leaf = run(0)
    # packed mode really stores EMA packed (flat vector + large list)
    assert isinstance(s_pack.ema_params, dict)
    assert set(s_pack.ema_params) == {"flat", "large"}
    assert s_pack.ema_params["flat"].ndim == 1
    np.testing.assert_allclose(n_pack, n_leaf, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_pack.params),
                    jax.tree_util.tree_leaves(s_leaf.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)
    pack_ema = s_pack.ema_param_tree()
    assert (jax.tree_util.tree_structure(pack_ema)
            == jax.tree_util.tree_structure(s_leaf.ema_params))
    for a, b in zip(jax.tree_util.tree_leaves(pack_ema),
                    jax.tree_util.tree_leaves(s_leaf.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-7)
    # val step consumes the packed EMA transparently
    tr = DiffusionTrainer(
        tiny_setup["ld"], tiny_setup["vae_params"],
        optim_config=dict(lr=1e-3, total_num_steps=10,
                          gradient_clip_val=1e-3),
        pack_small_thr=4096,
    )
    m = tr.val_step(s_pack, jax.random.PRNGKey(2), x, y)
    assert np.isfinite(float(m["val/loss"]))


def test_checkpoint_layout_mismatch_clear_error(tiny_setup, tmp_path):
    """A checkpoint saved under pack_small_thr must refuse to restore into a
    per-leaf state (and vice versa) with a clear ValueError naming the knob,
    not an opaque pytree-structure error (ADVICE r3)."""
    import pytest

    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer
    from prediff_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint

    def make_state(thr):
        tr = DiffusionTrainer(
            tiny_setup["ld"], tiny_setup["vae_params"],
            optim_config=dict(lr=1e-3, total_num_steps=10),
            pack_small_thr=thr,
        )
        return tr.create_state(tiny_setup["unet_params"])

    packed = make_state(4096)
    save_checkpoint(str(tmp_path / "ck"), packed)
    with pytest.raises(ValueError, match="pack_small_thr"):
        restore_checkpoint(str(tmp_path / "ck"), make_state(0))
    # matching layout restores fine
    restored = restore_checkpoint(str(tmp_path / "ck"), make_state(4096))
    np.testing.assert_allclose(
        np.asarray(restored.ema_params["flat"]),
        np.asarray(packed.ema_params["flat"]),
    )


def test_train_step_rbg_prng(tiny_setup):
    """prng_impl='rbg' (TPU hardware RNG on device; functional on CPU too)
    trains to a finite loss and produces different — but statistically
    comparable — randomness than threefry."""
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    x = jnp.asarray(np.random.RandomState(0).rand(
        2, tiny_setup["OUT_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(
        2, tiny_setup["IN_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32))

    def one_step(impl):
        tr = DiffusionTrainer(
            tiny_setup["ld"], tiny_setup["vae_params"],
            optim_config=dict(lr=1e-3, total_num_steps=10), prng_impl=impl,
        )
        state = tr.create_state(tiny_setup["unet_params"])
        _, m = tr.train_step(state, jax.random.PRNGKey(0), x, y)
        return float(m["train/loss"])

    loss_rbg, loss_tf = one_step("rbg"), one_step(None)
    assert np.isfinite(loss_rbg) and np.isfinite(loss_tf)
    # different streams, same distribution: both O(1) eps-prediction losses
    assert loss_rbg != loss_tf
    assert 0.1 < loss_rbg < 10.0 and 0.1 < loss_tf < 10.0


def test_track_grad_norm_per_module(tiny_setup):
    """track_grad_norm logs one norm per top-level UNet module + logvar, and
    their square-sum matches the global norm (ref track_grad_norm=2)."""
    from prediff_tpu.training.diffusion_trainer import DiffusionTrainer

    trainer = DiffusionTrainer(
        tiny_setup["ld"], tiny_setup["vae_params"],
        optim_config=dict(lr=1e-3, total_num_steps=10),
        track_grad_norm=True,
    )
    state = trainer.create_state(tiny_setup["unet_params"])
    x = jnp.asarray(np.random.RandomState(0).rand(
        2, tiny_setup["OUT_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(1).rand(
        2, tiny_setup["IN_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1
    ).astype(np.float32))
    _, metrics = trainer.train_step(state, jax.random.PRNGKey(0), x, y)
    per_module = {k: float(v) for k, v in metrics.items()
                  if k.startswith("grad_norm/")}
    expected_keys = {f"grad_norm/unet.{n}" for n in tiny_setup["unet_params"]}
    expected_keys.add("grad_norm/logvar")  # learn_logvar=True in the fixture
    assert set(per_module) == expected_keys
    total = float(metrics["grad_norm"])
    assert np.sqrt(sum(v**2 for v in per_module.values())) == pytest.approx(
        total, rel=1e-5
    )


def test_alignment_train_step(tiny_setup):
    from prediff_tpu.training.alignment_trainer import AlignmentTrainer
    from prediff_tpu.models.alignment import NoisyCuboidTransformerEncoder
    from prediff_tpu.models.vae import AutoencoderKL

    mesh = make_mesh()
    model = NoisyCuboidTransformerEncoder(
        input_shape=(tiny_setup["OUT_LEN"], tiny_setup["LAT"], tiny_setup["LAT"],
                     tiny_setup["LAT_C"]),
        out_channels=1, base_units=8, depth=[1], block_attn_patterns="full",
        num_heads=2, padding_type="zeros", readout_seq=True,
        out_len=tiny_setup["OUT_LEN"], ffn_activation="gelu",
    )
    vae = tiny_setup["vae"]
    trainer = AlignmentTrainer(
        model_apply=model.apply,
        vae_apply_encode=lambda v, x: vae.apply(v, x, method=AutoencoderKL.encode_moments),
        vae_params=tiny_setup["vae_params"],
        timesteps=10,
        optim_config=dict(lr=1e-3, total_num_steps=100),
        mesh=mesh,
    )
    rng = jax.random.PRNGKey(2)
    z0 = jnp.zeros((2, tiny_setup["OUT_LEN"], tiny_setup["LAT"], tiny_setup["LAT"],
                    tiny_setup["LAT_C"]))
    params = model.init(rng, z0, jnp.zeros((2,), jnp.int32))["params"]
    state = trainer.create_state(params)
    B = 8
    x = shard_batch(jnp.asarray(np.random.RandomState(2).rand(
        B, tiny_setup["OUT_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1).astype(np.float32)), mesh)
    y = shard_batch(jnp.asarray(np.random.RandomState(3).rand(
        B, tiny_setup["IN_LEN"], tiny_setup["IMG"], tiny_setup["IMG"], 1).astype(np.float32)), mesh)
    first = None
    for i in range(10):
        state, metrics = trainer.train_step(state, rng, x, y)
        if first is None:
            first = float(metrics["train_loss"])
    assert np.isfinite(float(metrics["train_loss"]))
    assert float(metrics["relative_mae"]) >= 0


def test_vae_gan_train_step(tiny_setup):
    from prediff_tpu.training.vae_trainer import VAETrainer
    from prediff_tpu.training.losses import NLayerDiscriminator

    mesh = make_mesh()
    trainer = VAETrainer(
        vae=tiny_setup["vae"],
        disc=NLayerDiscriminator(input_nc=1, ndf=8, n_layers=1),
        disc_start=2,  # kick in quickly to exercise the GAN path
        kl_weight=1e-6,
        disc_weight=0.5,
        optim_config=dict(lr=1e-4, total_num_steps=100),
        mesh=mesh,
    )
    rng = jax.random.PRNGKey(3)
    sample = jnp.zeros((2, tiny_setup["IMG"], tiny_setup["IMG"], 1))
    gen_state, disc_state, batch_stats = trainer.create_states(rng, sample)
    B = 8
    x = shard_batch(jnp.asarray(np.random.RandomState(5).rand(
        B, tiny_setup["IMG"], tiny_setup["IMG"], 1).astype(np.float32)), mesh)
    for i in range(4):
        gen_state, disc_state, batch_stats, logs = trainer.train_step(
            gen_state, disc_state, batch_stats, rng, x
        )
    assert np.isfinite(float(logs["train/total_loss"]))
    assert np.isfinite(float(logs["train/disc_loss"]))
    assert float(logs["train/d_weight"]) >= 0
    assert float(logs["train/disc_factor"]) == 1.0  # past disc_start
    assert int(gen_state.step) == 4 and int(disc_state.step) == 4


def test_vae_gan_train_step_bf16_compute(tiny_setup):
    """compute_dtype='bfloat16' must (a) keep the params/opt-state tree
    f32, (b) produce finite losses, and (c) track the f32 path's first-step
    loss to bf16 rounding (the mode only changes activation/param dtype
    inside the autoencoder; loss math stays f32)."""
    from prediff_tpu.training.vae_trainer import VAETrainer
    from prediff_tpu.training.losses import NLayerDiscriminator

    rng = jax.random.PRNGKey(3)
    sample = jnp.zeros((2, tiny_setup["IMG"], tiny_setup["IMG"], 1))
    B = 4
    x = jnp.asarray(np.random.RandomState(5).rand(
        B, tiny_setup["IMG"], tiny_setup["IMG"], 1).astype(np.float32))

    losses = {}
    for cd in (None, "bfloat16"):
        trainer = VAETrainer(
            vae=tiny_setup["vae"],
            disc=NLayerDiscriminator(input_nc=1, ndf=8, n_layers=1),
            disc_start=0,
            kl_weight=1e-6,
            disc_weight=0.5,
            optim_config=dict(lr=1e-4, total_num_steps=100),
            compute_dtype=cd,
        )
        gen_state, disc_state, batch_stats = trainer.create_states(rng, sample)
        # stored trees stay f32 regardless of the compute dtype
        assert all(
            l.dtype == jnp.float32
            for l in jax.tree_util.tree_leaves(gen_state.params)
            if jnp.issubdtype(l.dtype, jnp.floating)
        )
        for _ in range(3):
            gen_state, disc_state, batch_stats, logs = trainer.train_step(
                gen_state, disc_state, batch_stats, rng, x
            )
        assert np.isfinite(float(logs["train/total_loss"]))
        assert np.isfinite(float(logs["train/disc_loss"]))
        assert all(
            l.dtype == jnp.float32
            for l in jax.tree_util.tree_leaves(gen_state.params)
            if jnp.issubdtype(l.dtype, jnp.floating)
        )
        losses[cd] = float(logs["train/total_loss"])
    # identical data/seed: the two paths differ only by bf16 rounding in
    # the autoencoder; after 3 tiny-lr steps they must agree loosely
    assert abs(losses["bfloat16"] - losses[None]) < 0.05 * (
        1.0 + abs(losses[None])
    ), losses

    # 'auto' resolves to f32 off-TPU (CPU test path must stay reference-f32)
    tr_auto = VAETrainer(vae=tiny_setup["vae"], compute_dtype="auto")
    assert tr_auto._resolved_compute_dtype() is None


def test_discriminator_parity_vs_reference():
    from conftest import reference_available, import_reference

    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from prediff.taming.losses.model import NLayerDiscriminator as RefDisc
    from prediff_tpu.training.losses import NLayerDiscriminator
    from prediff_tpu.utils.convert import convert_torch_state_dict

    torch.manual_seed(0)
    ref = RefDisc(input_nc=1, ndf=8, n_layers=3).eval()
    ours = NLayerDiscriminator(input_nc=1, ndf=8, n_layers=3)
    x = np.random.RandomState(6).randn(2, 32, 32, 1).astype(np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = convert_torch_state_dict(ref.state_dict(), variables["params"])
    got = ours.apply(
        {"params": params, "batch_stats": variables.get("batch_stats", {})},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(got), expected.transpose(0, 2, 3, 1), rtol=2e-4, atol=2e-4
    )


def test_actnorm_data_dependent_init():
    """ActNorm init from a real batch matches the reference's lazy first-batch
    initialization (taming/losses/model.py:27-46): loc=-mean, scale=1/(std+eps),
    so the first forward output is standardized per channel."""
    import jax
    import jax.numpy as jnp
    from prediff_tpu.training.losses import ActNorm2D

    x = jnp.asarray(np.random.RandomState(4).rand(4, 8, 8, 3).astype(np.float32) * 5 + 2)
    m = ActNorm2D(num_features=3)
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    mean = np.asarray(x).transpose(3, 0, 1, 2).reshape(3, -1).mean(1)
    std = np.asarray(x).transpose(3, 0, 1, 2).reshape(3, -1).std(1, ddof=1)
    np.testing.assert_allclose(np.asarray(params["loc"]).ravel(), -mean, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["scale"]).ravel(), 1.0 / (std + 1e-6), rtol=1e-5
    )
    out = m.apply({"params": params}, x)
    flat = np.asarray(out).transpose(3, 0, 1, 2).reshape(3, -1)
    np.testing.assert_allclose(flat.mean(1), 0.0, atol=1e-5)
    np.testing.assert_allclose(flat.std(1, ddof=1), 1.0, atol=1e-4)
    # constant init batch degrades to identity (scale=1), not a 1e6 blow-up
    z = jnp.zeros((2, 4, 4, 3))
    pz = m.init(jax.random.PRNGKey(0), z)["params"]
    np.testing.assert_allclose(np.asarray(pz["scale"]).ravel(), 1.0)
