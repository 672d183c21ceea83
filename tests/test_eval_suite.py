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


def test_mean_metric_element_weighted_ragged_batches():
    """Epoch MSE over unequal batches must equal the flat element-weighted
    computation (torchmetrics semantics), not a mean of batch-means."""
    rng = np.random.RandomState(0)
    batches = [rng.rand(5, 4).astype(np.float32), rng.rand(2, 4).astype(np.float32)]
    targets = [rng.rand(5, 4).astype(np.float32), rng.rand(2, 4).astype(np.float32)]
    m = MeanMetric()
    for p, t in zip(batches, targets):
        m.update(mse(jnp.asarray(p), jnp.asarray(t)), weight=p.size)
    flat_p = np.concatenate([b.ravel() for b in batches])
    flat_t = np.concatenate([b.ravel() for b in targets])
    expected = float(np.mean((flat_p - flat_t) ** 2))
    assert m.compute() == pytest.approx(expected, rel=1e-6)
    # raw-array updates stay element-weighted without an explicit weight
    m2 = MeanMetric()
    for p, t in zip(batches, targets):
        m2.update(jnp.square(jnp.asarray(p) - jnp.asarray(t)))
    assert m2.compute() == pytest.approx(expected, rel=1e-6)


def test_suite_ragged_final_batch_matches_flat(data):
    """Suite epoch MSE/MAE with a ragged final batch == flat computation."""
    preds, target = data
    suite = ForecastEvalSuite(threshold_list=THRESHOLDS, seq_len=T)
    suite.update(preds, target)                      # full batch (B=2)
    suite.update(preds[:, :1], target[:1])           # ragged tail (B=1)
    got = suite.compute("test")
    all_p = np.concatenate(
        [np.asarray(preds).ravel(), np.asarray(preds[:, :1]).ravel()]
    )
    all_t = np.concatenate(
        [np.broadcast_to(np.asarray(target)[None], preds.shape).ravel(),
         np.broadcast_to(np.asarray(target[:1])[None], preds[:, :1].shape).ravel()]
    )
    assert got["test_mse_epoch"] == pytest.approx(
        float(np.mean((all_p - all_t) ** 2)), rel=1e-5
    )
    assert got["test_mae_epoch"] == pytest.approx(
        float(np.mean(np.abs(all_p - all_t))), rel=1e-5
    )


def test_suite_merge_equals_global(data):
    """Two shard suites merged == one suite over all data (the multi-host
    reduction path; ref torchmetrics dist_reduce_fx='sum')."""
    preds, target = data

    def cheap_features(videos):
        flat = videos.reshape(videos.shape[0], -1)
        return jnp.stack([flat[:, i::8].mean(axis=1) for i in range(8)], axis=1)

    def make(with_fvd):
        return ForecastEvalSuite(
            threshold_list=THRESHOLDS, seq_len=T,
            fvd=FrechetVideoDistance(feature_fn=cheap_features, num_features=8,
                                     auto_t=True) if with_fvd else None,
        )

    # shard 0 sees batch element 0, shard 1 sees element 1
    shard0, shard1, global_suite = make(True), make(True), make(True)
    shard0.update(preds[:, :1], target[:1])
    shard1.update(preds[:, 1:], target[1:])
    global_suite.update(preds[:, :1], target[:1])
    global_suite.update(preds[:, 1:], target[1:])
    shard0.merge(shard1)
    got, expected = shard0.compute("test"), global_suite.compute("test")
    assert set(got) == set(expected)
    for k in expected:
        # FVD's matrix sqrt amplifies f32 accumulation-order noise
        rel = 1e-3 if k == "test_fvd_epoch" else 1e-5
        assert got[k] == pytest.approx(expected[k], rel=rel), k


def test_suite_state_tree_roundtrip(data):
    """state_tree/load_state_tree (the process_allgather payload) preserves
    every metric, and summing two shard trees equals merge()."""
    preds, target = data
    a, b = (ForecastEvalSuite(threshold_list=THRESHOLDS, seq_len=T) for _ in range(2))
    a.update(preds[:, :1], target[:1])
    b.update(preds[:, 1:], target[1:])
    summed = {k: v + b.state_tree()[k] for k, v in a.state_tree().items()}
    merged = ForecastEvalSuite(threshold_list=THRESHOLDS, seq_len=T)
    merged.load_state_tree(summed)
    expected = ForecastEvalSuite(threshold_list=THRESHOLDS, seq_len=T)
    expected.update(preds[:, :1], target[:1])
    expected.update(preds[:, 1:], target[1:])
    got, want = merged.compute("test"), expected.compute("test")
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-5), k


def test_suite_rejects_unbatched_preds(data):
    preds, target = data
    suite = ForecastEvalSuite(threshold_list=THRESHOLDS, seq_len=T)
    with pytest.raises(AssertionError):
        suite.update(preds[0], target)
