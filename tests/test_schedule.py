import numpy as np
import pytest

from prediff_tpu.diffusion.schedule import (
    make_beta_schedule,
    make_gaussian_schedule,
    extract,
)

from conftest import reference_available, import_reference


@pytest.mark.parametrize("schedule", ["linear", "cosine", "sqrt_linear", "sqrt"])
def test_beta_schedule_matches_reference(schedule):
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    from prediff.diffusion.utils import make_beta_schedule as ref_make

    ours = make_beta_schedule(schedule, 1000)
    theirs = ref_make(schedule, 1000)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)


def test_schedule_buffers_identities():
    sch = make_gaussian_schedule("linear", timesteps=1000)
    ac = np.asarray(sch.alphas_cumprod, dtype=np.float64)
    # monotonic decreasing cumulative product of (1 - beta)
    assert np.all(np.diff(ac) < 0)
    np.testing.assert_allclose(
        np.asarray(sch.sqrt_alphas_cumprod) ** 2, ac, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(sch.sqrt_one_minus_alphas_cumprod) ** 2, 1 - ac, rtol=1e-4, atol=1e-7
    )
    # posterior mean coefficients must sum appropriately at t where x0 == xt
    # coef1 * sqrt(ac) + coef2 * 1 -> check DDPM identity mu(x0=xt/sqrt(ac))
    assert sch.num_timesteps == 1000
    # lvlb_weights finite and lvlb[0] == lvlb[1]
    lv = np.asarray(sch.lvlb_weights)
    assert np.isfinite(lv).all()
    assert lv[0] == lv[1]


def test_schedule_buffers_match_reference_registration():
    """Golden parity against the exact buffer math in
    latent_diffusion.py:228-278 (re-derived here in float64 numpy)."""
    betas = make_beta_schedule("linear", 1000)
    alphas = 1.0 - betas
    ac = np.cumprod(alphas)
    acp = np.append(1.0, ac[:-1])
    pv = betas * (1.0 - acp) / (1.0 - ac)
    sch = make_gaussian_schedule("linear", timesteps=1000)
    np.testing.assert_allclose(np.asarray(sch.posterior_variance), pv, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sch.posterior_mean_coef1),
        betas * np.sqrt(acp) / (1.0 - ac),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sch.posterior_mean_coef2),
        (1.0 - acp) * np.sqrt(alphas) / (1.0 - ac),
        rtol=1e-6,
    )


def test_extract_broadcast():
    import jax.numpy as jnp

    a = jnp.arange(10.0)
    t = jnp.array([0, 3, 9])
    out = extract(a, t, ndim=5, batch_axis=0)
    assert out.shape == (3, 1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 3, 9])
