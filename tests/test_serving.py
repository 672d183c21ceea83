"""Serving API smoke: predictor over the tiny config (random weights)."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from prediff_tpu.config import load_config, prediff_default_config
from prediff_tpu.serving import PreDiffPredictor

TINY = os.path.join(os.path.dirname(__file__), "..", "configs", "tiny_smoke.yaml")


def test_predictor_roundtrip(tmp_path):
    cfg = load_config(prediff_default_config, TINY)
    predictor = PreDiffPredictor(cfg=cfg, with_alignment=True)
    ctx = jnp.asarray(np.random.RandomState(0).rand(1, 3, 32, 32, 1).astype(np.float32))
    out = predictor.predict(ctx)
    assert out.shape == (1, 2, 32, 32, 1)
    out_ddim = predictor.predict(ctx, ddim_steps=3)
    assert out_ddim.shape == out.shape
    guided = predictor.predict(ctx, use_alignment=True,
                               avg_x_gt=np.asarray([[0.5]], np.float32))
    assert guided.shape == out.shape
    ens = predictor.predict_ensemble(ctx, num_samples=3)
    assert ens.shape == (3, 1, 2, 32, 32, 1)
    assert not np.allclose(np.asarray(ens[0]), np.asarray(ens[1]))

    # npz save -> from_npz load reproduces outputs with the same rng
    from prediff_tpu.utils.checkpoint import save_params_npz

    save_params_npz(str(tmp_path / "earthformerunet.npz"), predictor.params["unet"])
    save_params_npz(str(tmp_path / "vae.npz"), predictor.params["vae"])
    save_params_npz(str(tmp_path / "alignment.npz"), predictor.params["align"])
    p2 = PreDiffPredictor.from_npz(str(tmp_path), cfg=cfg, with_alignment=True)
    rng = jax.random.PRNGKey(7)
    a = predictor.predict(ctx, rng=rng)
    b = p2.predict(ctx, rng=rng)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
