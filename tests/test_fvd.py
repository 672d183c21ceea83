"""FVD tests: math golden values + I3D parity vs the torch reference."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.evaluation.fvd import (
    FrechetVideoDistance,
    FVDState,
    InceptionI3d,
    frechet_distance,
    frechet_distance_from_moments,
    preprocess_video,
)

from conftest import reference_available, import_reference


def test_frechet_distance_identical_zero():
    x = np.random.RandomState(0).randn(64, 16)
    assert frechet_distance(x, x.copy()) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_known_gaussians():
    # two isotropic gaussians shifted by mu: FD = d*mu^2 + trace terms ~ 0
    rng = np.random.RandomState(1)
    x1 = rng.randn(20000, 4)
    x2 = rng.randn(20000, 4) + 2.0
    fd = frechet_distance(x1, x2)
    assert fd == pytest.approx(4 * 4.0, rel=0.05)  # d * mu^2 = 16


def test_frechet_matches_reference_math():
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from prediff.evaluation.fvd.fvd import frechet_distance as ref_fd

    x1 = np.random.RandomState(2).randn(128, 24).astype(np.float64)
    x2 = np.random.RandomState(3).randn(128, 24).astype(np.float64) * 1.4 + 0.3
    ours = frechet_distance(x1, x2)
    theirs = float(ref_fd(torch.from_numpy(x1.copy()), torch.from_numpy(x2.copy())))
    assert ours == pytest.approx(theirs, rel=1e-4)


def test_streaming_state_equals_batch():
    x = np.random.RandomState(4).randn(40, 8).astype(np.float32)
    st = FVDState.zeros(8)
    st = st.update(jnp.asarray(x[:15]))
    st = st.update(jnp.asarray(x[15:]))
    m, c = st.mean_cov()
    np.testing.assert_allclose(m, x.mean(0), rtol=1e-4)
    np.testing.assert_allclose(c, np.cov(x, rowvar=False), rtol=1e-3, atol=1e-4)


def test_fvd_end_to_end_with_custom_features():
    # cheap feature fn: per-frame means -> FVD(real, real-like) < FVD(real, shifted)
    def feat(videos):
        B = videos.shape[0]
        return videos.reshape(B, videos.shape[1], -1).mean(-1)

    rng = np.random.RandomState(5)
    fvd = FrechetVideoDistance(feature_fn=feat, num_features=10, auto_t=True)
    real = rng.rand(32, 10, 8, 8, 1).astype(np.float32)
    close = np.clip(real + 0.01 * rng.randn(*real.shape).astype(np.float32), 0, 1)
    far = np.clip(real + 0.4, 0, 1)
    fvd.update(jnp.asarray(real), real=True)
    fvd.update(jnp.asarray(close), real=False)
    fvd_close = fvd.compute()
    fvd.reset()
    fvd.update(jnp.asarray(real), real=True)
    fvd.update(jnp.asarray(far), real=False)
    fvd_far = fvd.compute()
    assert fvd_close < fvd_far


def test_i3d_parity_small_input():
    """Full InceptionI3d parity vs the torch reference with converted random
    weights (small spatial input to keep CPU time sane; pooling windows still
    valid at 112x112, T=9)."""
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from prediff.evaluation.fvd.pytorch_i3d import InceptionI3d as RefI3d
    from prediff_tpu.utils.convert import convert_torch_state_dict, _flatten

    torch.manual_seed(0)
    ref = RefI3d(num_classes=40).eval()
    ours = InceptionI3d(num_classes=40)
    x = np.random.RandomState(6).rand(1, 9, 224, 224, 3).astype(np.float32) * 2 - 1
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    params = convert_torch_state_dict(
        ref.state_dict(), variables["params"],
        skip_suffixes=("num_batches_tracked", "running_mean", "running_var"),
    )
    # running stats -> batch_stats (fresh init: zeros/ones both sides)
    got = ours.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        expected = ref(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).numpy()
    assert got.shape == expected.shape == (1, 40)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=5e-3, atol=5e-3)


def test_preprocess_video_shapes():
    v = jnp.asarray(np.random.RandomState(7).rand(2, 9, 128, 160, 3).astype(np.float32))
    out = preprocess_video(v, target_resolution=64)
    assert out.shape == (2, 9, 64, 64, 3)
    assert float(out.min()) >= -1.0 and float(out.max()) <= 1.0
