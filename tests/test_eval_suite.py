"""ForecastEvalSuite: batched-ensemble metric accumulation must equal the
reference's per-member update loop (train_sevirlr_prediff.py:905-969)."""
import numpy as np
import jax.numpy as jnp
import pytest

from prediff_tpu.evaluation import (
    ForecastEvalSuite,
    FrechetVideoDistance,
    SEVIRSkillScore,
    MeanMetric,
    mse,
    mae,
    ssim,
    crps_ensemble,
)

M, B, T, H, W = 3, 2, 6, 16, 16
THRESHOLDS = (16, 74, 133)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(3)
    preds = jnp.asarray(rng.rand(M, B, T, H, W, 1).astype(np.float32))
    target = jnp.asarray(rng.rand(B, T, H, W, 1).astype(np.float32))
    return preds, target


def test_suite_equals_member_loop(data):
    preds, target = data
    suite = ForecastEvalSuite(threshold_list=THRESHOLDS,
                              metrics_list=("csi", "pod"), seq_len=T)
    suite.update(preds, target)
    got = suite.compute("test")

    # hand-rolled per-member loop (the reference's update pattern)
    score = SEVIRSkillScore(threshold_list=THRESHOLDS,
                            metrics_list=("csi", "pod"))
    mses, maes, ssims = MeanMetric(), MeanMetric(), MeanMetric()
    for m in range(M):
        score.update(preds[m], target)
        mses.update(mse(preds[m], target))
        maes.update(mae(preds[m], target))
        flat_p = preds[m].reshape((B * T, H, W, 1))
        flat_t = target.reshape((B * T, H, W, 1))
        ssims.update(ssim(flat_p, flat_t))
    expected_scores = score.compute()

    assert got["test_mse_epoch"] == pytest.approx(mses.compute(), rel=1e-6)
    assert got["test_mae_epoch"] == pytest.approx(maes.compute(), rel=1e-6)
    assert got["test_ssim_epoch"] == pytest.approx(ssims.compute(), rel=1e-6)
    for th in THRESHOLDS:
        assert got[f"test_csi_{th}_epoch"] == pytest.approx(
            float(np.mean(expected_scores[th]["csi"])), rel=1e-6
        )
    assert got["test_csi_avg_epoch"] == pytest.approx(
        float(np.mean(expected_scores["avg"]["csi"])), rel=1e-6
    )
    # the checkpoint monitor is the negated avg CSI (ref :881-883)
    assert got["test_loss_epoch"] == -got["test_csi_avg_epoch"]
    assert got["test_crps_epoch"] == pytest.approx(
        float(crps_ensemble(preds, target)), rel=1e-6
    )


def test_suite_fvd_wiring(data):
    preds, target = data

    def cheap_features(videos):
        # (B, T, H, W, C) -> (B, 8) deterministic projection
        flat = videos.reshape(videos.shape[0], -1)
        return jnp.stack([flat[:, i::8].mean(axis=1) for i in range(8)], axis=1)

    fvd = FrechetVideoDistance(feature_fn=cheap_features, num_features=8,
                               auto_t=True, reset_real_features=False)
    suite = ForecastEvalSuite(threshold_list=THRESHOLDS, seq_len=T, fvd=fvd)
    suite.update(preds, target)
    out = suite.compute("test")
    assert np.isfinite(out["test_fvd_epoch"])
    # fake saw M*B videos, real saw B
    assert int(fvd.fake.num_samples) == M * B
    assert int(fvd.real.num_samples) == B
    # reset keeps real features when reset_real_features=False (ref parity)
    suite.reset()
    assert int(fvd.real.num_samples) == B
    assert int(fvd.fake.num_samples) == 0


def test_suite_rejects_unbatched_preds(data):
    preds, target = data
    suite = ForecastEvalSuite(threshold_list=THRESHOLDS, seq_len=T)
    with pytest.raises(AssertionError):
        suite.update(preds[0], target)
