"""SEVIR data pipeline tests on a synthetic SEVIR-LR-format dataset."""
import numpy as np
import pytest

from prediff_tpu.datasets import (
    SEVIRDataLoader,
    SEVIRDataModule,
    make_synthetic_sevir_lr,
    synthetic_batch_iterator,
    augment_seq,
)
from prediff_tpu.datasets.sevir import change_layout, max_pool_downsample


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("sevirlr")
    return make_synthetic_sevir_lr(str(root), num_events=8, H=32, W=32, T=25)


def test_change_layout():
    x = np.random.RandomState(0).rand(2, 8, 8, 25)  # NHWT
    y = change_layout(x, "NHWT", "NTHWC")
    assert y.shape == (2, 25, 8, 8, 1)
    np.testing.assert_array_equal(y[0, 3, :, :, 0], x[0, :, :, 3])


def test_max_pool_downsample():
    x = np.arange(2 * 6 * 6 * 4).reshape(2, 6, 6, 4).astype(np.float32)  # NHWT
    y = max_pool_downsample(x, (2, 3, 3), layout="NHWT")
    assert y.shape == (2, 2, 2, 2)
    assert y[0, 0, 0, 0] == x[0, :3, :3, 0].max()


def test_loader_windows_and_preprocess(synth_root):
    dl = SEVIRDataLoader(
        data_types=["vil"], seq_len=13, raw_seq_len=25, stride=6,
        layout="NTHWC", sevir_catalog=f"{synth_root}/CATALOG.csv",
        sevir_data_dir=f"{synth_root}/data",
    )
    assert dl.num_seq_per_event == 3  # (25-13)//6 + 1
    assert dl.total_num_event == 8
    assert dl.total_num_seq == 24
    batch = dl._idx_sample(0)
    vil = batch["vil"]
    assert vil.shape == (1, 13, 32, 32, 1)
    assert vil.dtype == np.float32
    assert 0.0 <= vil.min() and vil.max() <= 1.0
    # window 1 of event 0 should equal frames 6:19 of window stack
    b0 = dl._idx_sample(0)["vil"]
    b1 = dl._idx_sample(1)["vil"]
    full = dl._load_event_batch(0, 1)[0]  # (1, H, W, 25) raw uint8->float
    np.testing.assert_allclose(
        b1[0, :, :, :, 0].transpose(1, 2, 0), full[0][:, :, 6:19] / 255.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        b0[0, :, :, :, 0].transpose(1, 2, 0), full[0][:, :, 0:13] / 255.0, rtol=1e-6
    )
    dl.close()


def test_loader_sharding(synth_root):
    kw = dict(
        data_types=["vil"], seq_len=13, raw_seq_len=25, stride=6,
        layout="NTHWC", sevir_catalog=f"{synth_root}/CATALOG.csv",
        sevir_data_dir=f"{synth_root}/data",
    )
    full = SEVIRDataLoader(num_shard=1, rank=0, **kw)
    shards = [SEVIRDataLoader(num_shard=4, rank=r, **kw) for r in range(4)]
    assert sum(s.num_event for s in shards) == full.total_num_event
    # 'ceil' mode: all shards same length
    ceil_shards = [
        SEVIRDataLoader(num_shard=3, rank=r, split_mode="ceil", **kw) for r in range(3)
    ]
    lens = [s.num_event for s in ceil_shards]
    assert len(set(lens)) == 1
    for s in shards + ceil_shards + [full]:
        s.close()


def test_datamodule_split(synth_root):
    dm = SEVIRDataModule(
        seq_len=13, stride=6, layout="NTHWC", sevir_dir=str(synth_root),
        batch_size=2, val_ratio=0.25, dataset_name="sevirlr",
    )
    dm.setup()
    # 4 events before and 4 after the 2019-06-01 split
    assert dm.num_test_samples == 12
    assert dm.num_train_samples + dm.num_val_samples == 12
    assert dm.num_val_samples == 3
    train_batches = list(dm.train_batches())
    assert all(b.shape == (2, 13, 32, 32, 1) for b in train_batches)
    test_batches = list(dm.test_batches())
    assert sum(b.shape[0] for b in test_batches) == 12


def test_augmentation_modes():
    rng = np.random.default_rng(0)
    x = np.random.RandomState(1).rand(13, 16, 16, 1).astype(np.float32)
    out0 = augment_seq(x, "THWC", "0", rng)
    np.testing.assert_array_equal(out0, x)
    out2 = augment_seq(x, "THWC", "2", rng)
    assert out2.shape == x.shape
    # rot90/flips preserve the multiset of values
    np.testing.assert_allclose(np.sort(out2.ravel()), np.sort(x.ravel()), rtol=1e-6)
    out1 = augment_seq(x, "THWC", "1", rng)
    assert out1.shape == x.shape


def test_synthetic_iterator():
    it = synthetic_batch_iterator(batch_size=2, seq_len=13, H=32, W=32, num_batches=2)
    batches = list(it)
    assert len(batches) == 2
    assert batches[0].shape == (2, 13, 32, 32, 1)
    assert 0 <= batches[0].min() and batches[0].max() <= 1.0


def test_loader_random_mode(synth_root):
    dl = SEVIRDataLoader(
        data_types=["vil"], seq_len=13, raw_seq_len=25, stride=6,
        sample_mode="random", layout="NTHWC",
        sevir_catalog=f"{synth_root}/CATALOG.csv",
        sevir_data_dir=f"{synth_root}/data", shuffle_seed=3,
    )
    batches = list(dl)
    assert len(batches) == len(dl)
    assert all(b["vil"].shape == (1, 13, 32, 32, 1) for b in batches)
    # random windows: not all batches identical
    assert any(
        not np.allclose(batches[0]["vil"], b["vil"]) for b in batches[1:]
    )
    dl.close()
