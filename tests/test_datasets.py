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


def test_rasterize_lightning_golden():
    """Hand-built strike table -> expected dense grid (pins the rewrite)."""
    from prediff_tpu.datasets.sevir import rasterize_lightning

    frame_times = np.array([0.0, 300.0, 600.0])  # 3 frames, 5-min edges
    strikes = np.array([
        # t,    _, _,  x,  y
        [10.0,  0, 0,  2,  3],   # frame 0 at (y=3, x=2)
        [10.0,  0, 0,  2,  3],   # same cell again -> count 2
        [-50.0, 0, 0,  0,  0],   # before first edge -> clamped to frame 0
        [310.0, 0, 0,  1,  0],   # frame 1
        [900.0, 0, 0,  3,  3],   # past last edge -> clamped to last frame
        [10.0,  0, 0, -1,  2],   # off-grid x -> dropped
        [10.0,  0, 0,  4,  2],   # off-grid x -> dropped
        [10.0,  0, 0,  2,  4],   # off-grid y -> dropped
    ])
    grid = rasterize_lightning(strikes, grid_hw=(4, 4), frame_times=frame_times)
    expected = np.zeros((4, 4, 3), np.int16)
    expected[3, 2, 0] = 2
    expected[0, 0, 0] = 1
    expected[0, 1, 1] = 1
    expected[3, 3, 2] = 1
    np.testing.assert_array_equal(grid, expected)


def test_rasterize_lightning_empty():
    from prediff_tpu.datasets.sevir import rasterize_lightning

    grid = rasterize_lightning(np.zeros((0, 5)), grid_hw=(48, 48))
    assert grid.shape == (48, 48, 25 * 2 - 1)
    assert grid.sum() == 0


def test_rasterize_lightning_reference_parity():
    """A/B vs the reference's _lght_to_grid on random strike tables."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conftest import reference_available, import_reference

    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    from prediff.datasets.sevir.sevir_dataloader import SEVIRDataLoader as RefDL
    from prediff_tpu.datasets.sevir import (
        rasterize_lightning, LIGHTING_FRAME_TIMES, SEVIR_DATA_SHAPE,
    )

    class _Stub:
        data_shape = SEVIR_DATA_SHAPE
        lght_frame_times = LIGHTING_FRAME_TIMES

    rng = np.random.RandomState(11)
    for n in (0, 1, 500):
        strikes = np.stack([
            rng.uniform(-9000, 9000, n),        # t seconds
            rng.uniform(0, 1, n), rng.uniform(0, 1, n),
            rng.randint(-5, 53, n).astype(float),  # x incl. off-grid
            rng.randint(-5, 53, n).astype(float),  # y incl. off-grid
        ], axis=1) if n else np.zeros((0, 5))
        ref = RefDL._lght_to_grid(_Stub(), strikes)
        ours = rasterize_lightning(strikes)
        np.testing.assert_array_equal(ours, ref[0].astype(np.int16))


def test_fixed_angle_rotation_spec():
    """Pins the free-angle rotation conventions to torchvision's
    RandomRotation defaults (ref sevir_torch_wrap.py:130-134): CCW direction
    in display coords, geometric-center pivot, nearest interpolation, 0 fill."""
    from prediff_tpu.datasets.augmentation import fixed_angle_rotation

    img = np.zeros((2, 11, 11), np.float32)  # (T, H, W)
    img[:, 5, 9] = 1.0  # impulse right of center (dx=+4)

    # +90 CCW: right-of-center -> above center; equals the rot90 fast path
    out90 = fixed_angle_rotation(img, 90, h_axis=1, w_axis=2)
    assert out90[0, 1, 5] == 1.0
    np.testing.assert_array_equal(out90, np.rot90(img, 1, axes=(1, 2)))

    # +45 CCW: (dx,dy)=(4,0) -> (2.83,-2.83) -> nearest (3,-3)
    out45 = fixed_angle_rotation(img, 45, h_axis=1, w_axis=2)
    assert out45[0, 2, 8] == 1.0
    # nearest interpolation only ever samples original values (+ fill 0)
    assert set(np.unique(out45)).issubset({0.0, 1.0})

    # -45 is the mirror
    outm45 = fixed_angle_rotation(img, -45, h_axis=1, w_axis=2)
    assert outm45[0, 8, 8] == 1.0
