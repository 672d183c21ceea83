import numpy as np
import jax
import jax.numpy as jnp

from prediff_tpu.training.lpips import LPIPS, VGG16Features


def test_lpips_shapes_and_zero_distance():
    model = LPIPS()
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    y = jnp.asarray(np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32) * 2 - 1)
    variables = model.init(jax.random.PRNGKey(0), x, y)
    d_same = model.apply(variables, x, x)
    d_diff = model.apply(variables, x, y)
    assert d_same.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    assert np.asarray(jnp.abs(d_diff)).mean() >= 0


def test_lpips_param_paths_match_torch_convention():
    """Converted torch keys 'net.slice1.0.weight' / 'lin0.model.1.weight'
    must resolve in our tree."""
    from prediff_tpu.utils.convert import torch_key_to_flax_path, _flatten

    model = LPIPS()
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x, x)["params"]
    flat = _flatten(params)
    for tkey in ["net.slice1.0.weight", "net.slice3.14.weight",
                 "net.slice5.28.weight", "lin0.model.1.weight",
                 "lin4.model.1.weight"]:
        path = torch_key_to_flax_path(tkey)[:-1] + ("kernel",)
        assert path in flat, (tkey, path, list(flat)[:5])
