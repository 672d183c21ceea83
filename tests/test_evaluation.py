"""Evaluation metric tests: skill scores vs the torch reference + golden
sanity for MSE/MAE/SSIM/CRPS."""
import numpy as np
import pytest
import jax.numpy as jnp

from prediff_tpu.evaluation import (
    SEVIRSkillScore,
    MeanMetric,
    mse,
    mae,
    ssim,
    crps_ensemble,
)

from conftest import reference_available, import_reference


def test_skill_score_hand_counts():
    # 2x2 single-frame example with threshold 128 (on 0-255 scale)
    target = np.asarray([[200, 50], [200, 200]], np.float32) / 255.0
    pred = np.asarray([[200, 200], [50, 200]], np.float32) / 255.0
    # hits=2 (both >= th), miss=1, fa=1
    s = SEVIRSkillScore(layout="NHWC", mode="0", threshold_list=(128,))
    s.update(jnp.asarray(pred[None, :, :, None]), jnp.asarray(target[None, :, :, None]))
    out = s.compute()
    eps = 1e-4
    assert out[128]["csi"] == pytest.approx(2 / (2 + 1 + 1 + eps), rel=1e-4)
    assert out[128]["pod"] == pytest.approx(2 / (2 + 1 + eps), rel=1e-4)
    assert out[128]["sucr"] == pytest.approx(2 / (2 + 1 + eps), rel=1e-4)


@pytest.mark.parametrize("mode", ["0", "1", "2"])
def test_skill_score_parity_vs_reference(mode):
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from prediff.datasets.sevir.evaluation import SEVIRSkillScore as RefScore

    pred = np.random.RandomState(0).rand(2, 6, 16, 16, 1).astype(np.float32)
    target = np.random.RandomState(1).rand(2, 6, 16, 16, 1).astype(np.float32)
    ref = RefScore(layout="NTHWC", mode=mode, seq_len=6)
    ref.update(torch.from_numpy(pred), torch.from_numpy(target))
    expected = ref.compute()
    ours = SEVIRSkillScore(layout="NTHWC", mode=mode, seq_len=6)
    ours.update(jnp.asarray(pred), jnp.asarray(target))
    got = ours.compute()
    for th in list(ours.threshold_list) + ["avg"]:
        for metric in ours.metrics_list:
            np.testing.assert_allclose(
                np.asarray(got[th][metric]), np.asarray(expected[th][metric]),
                rtol=1e-4, atol=1e-5,
                err_msg=f"mode={mode} th={th} metric={metric}",
            )


def test_skill_score_pooled_variant():
    pred = np.random.RandomState(2).rand(1, 6, 16, 16, 1).astype(np.float32)
    target = np.random.RandomState(3).rand(1, 6, 16, 16, 1).astype(np.float32)
    s = SEVIRSkillScore(layout="NTHWC", mode="0", preprocess_type="sevir_pool4")
    s.update(jnp.asarray(pred), jnp.asarray(target))
    out = s.compute()
    assert 0 <= out["avg"]["csi"] <= 1


def test_skill_score_multi_shard_merge():
    pred = np.random.RandomState(4).rand(4, 6, 8, 8, 1).astype(np.float32)
    target = np.random.RandomState(5).rand(4, 6, 8, 8, 1).astype(np.float32)
    whole = SEVIRSkillScore(layout="NTHWC", mode="0")
    whole.update(jnp.asarray(pred), jnp.asarray(target))
    a = SEVIRSkillScore(layout="NTHWC", mode="0")
    a.update(jnp.asarray(pred[:2]), jnp.asarray(target[:2]))
    b = SEVIRSkillScore(layout="NTHWC", mode="0")
    b.update(jnp.asarray(pred[2:]), jnp.asarray(target[2:]))
    merged = a.state.merge(b.state)
    got = whole.compute()
    got_merged = a.compute(merged)
    for th in whole.threshold_list:
        assert got[th]["csi"] == pytest.approx(got_merged[th]["csi"], rel=1e-6)


def test_basic_metrics():
    x = jnp.asarray(np.random.RandomState(6).rand(2, 32, 32, 1).astype(np.float32))
    y = jnp.asarray(np.random.RandomState(7).rand(2, 32, 32, 1).astype(np.float32))
    assert float(mse(x, x)) == 0
    assert float(mae(x, x)) == 0
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    assert float(ssim(x, y)) < 0.5
    m = MeanMetric()
    m.update(jnp.asarray([1.0, 2.0, 3.0]))
    m.update(jnp.asarray([4.0]))
    assert m.compute() == pytest.approx(2.5)


def test_crps():
    target = jnp.asarray(np.random.RandomState(8).rand(4, 4).astype(np.float32))
    perfect = jnp.stack([target] * 5)
    assert float(crps_ensemble(perfect, target)) == pytest.approx(0.0, abs=1e-7)
    # CRPS of a single deterministic forecast reduces to MAE
    single = target[None] + 0.3
    assert float(crps_ensemble(single, target, fair=False)) == pytest.approx(0.3, rel=1e-5)
    # a spread ensemble centred on the target beats a biased one
    rng = np.random.RandomState(9)
    centred = jnp.asarray(target[None] + 0.1 * rng.randn(8, 4, 4).astype(np.float32))
    biased = jnp.asarray(target[None] + 0.5 + 0.1 * rng.randn(8, 4, 4).astype(np.float32))
    assert float(crps_ensemble(centred, target)) < float(crps_ensemble(biased, target))
