"""DDIM helper parity vs the reference (which ships them unused)."""
import numpy as np
import pytest

from prediff_tpu.diffusion.schedule import (
    make_ddim_timesteps,
    make_ddim_sampling_parameters,
    make_gaussian_schedule,
)

from conftest import reference_available, import_reference


@pytest.mark.parametrize("method,n", [("uniform", 50), ("uniform", 100), ("quad", 50)])
def test_ddim_timesteps_match_reference(method, n):
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    from prediff.diffusion.utils import make_ddim_timesteps as ref_make

    ours = make_ddim_timesteps(method, n, 1000)
    theirs = ref_make(method, n, 1000, verbose=False)
    np.testing.assert_array_equal(ours, theirs)


def test_ddim_sampling_parameters_match_reference():
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    from prediff.diffusion.utils import (
        make_ddim_timesteps as ref_ts,
        make_ddim_sampling_parameters as ref_params,
    )

    sch = make_gaussian_schedule("linear", timesteps=1000)
    ac = np.asarray(sch.alphas_cumprod, np.float64)
    ts = make_ddim_timesteps("uniform", 50, 1000)
    ts = np.clip(ts, 0, 999)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, eta=1.0)
    r_sigmas, r_alphas, r_alphas_prev = ref_params(ac, ts, eta=1.0, verbose=False)
    np.testing.assert_allclose(sigmas, np.asarray(r_sigmas), rtol=1e-10)
    np.testing.assert_allclose(alphas, np.asarray(r_alphas), rtol=1e-10)
    np.testing.assert_allclose(alphas_prev, np.asarray(r_alphas_prev), rtol=1e-10)


def test_ddim_deterministic_eta0_statistics():
    """eta=0 -> sigmas all zero (deterministic DDIM)."""
    sch = make_gaussian_schedule("linear", timesteps=1000)
    ac = np.asarray(sch.alphas_cumprod, np.float64)
    ts = np.clip(make_ddim_timesteps("uniform", 20, 1000), 0, 999)
    sigmas, alphas, alphas_prev = make_ddim_sampling_parameters(ac, ts, eta=0.0)
    assert np.all(sigmas == 0)
    assert np.all(alphas_prev[1:] == alphas[:-1])
