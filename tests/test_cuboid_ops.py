import numpy as np
import pytest
import jax.numpy as jnp

from prediff_tpu.ops import (
    cuboid_reorder,
    cuboid_reorder_reverse,
    compute_cuboid_self_attention_mask,
    update_cuboid_size_shift_size,
    masked_softmax,
    generalize_padding,
    generalize_unpadding,
)

from conftest import reference_available, import_reference


CASES = [
    # (T, H, W), cuboid, strategy
    ((13, 16, 16), (13, 1, 1), ("l", "l", "l")),
    ((13, 16, 16), (1, 16, 1), ("l", "l", "l")),
    ((13, 16, 16), (1, 1, 16), ("l", "l", "l")),
    ((8, 8, 8), (2, 4, 4), ("l", "l", "l")),
    ((8, 8, 8), (2, 4, 4), ("d", "d", "d")),
    ((8, 8, 8), (2, 4, 4), ("l", "d", "l")),
    ((4, 8, 8), (4, 2, 2), ("d", "l", "d")),
]


@pytest.mark.parametrize("shape,cuboid,strategy", CASES)
def test_reorder_roundtrip(shape, cuboid, strategy):
    T, H, W = shape
    x = np.random.RandomState(0).randn(2, T, H, W, 3).astype(np.float32)
    r = cuboid_reorder(jnp.asarray(x), cuboid, strategy)
    nC = (T // cuboid[0]) * (H // cuboid[1]) * (W // cuboid[2])
    vol = cuboid[0] * cuboid[1] * cuboid[2]
    assert r.shape == (2, nC, vol, 3)
    back = cuboid_reorder_reverse(r, cuboid, strategy, (T, H, W))
    np.testing.assert_array_equal(np.asarray(back), x)


@pytest.mark.parametrize("shape,cuboid,strategy", CASES)
def test_reorder_matches_reference(shape, cuboid, strategy):
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from prediff.models.cuboid_transformer.cuboid_transformer import (
        cuboid_reorder as ref_reorder,
    )

    T, H, W = shape
    x = np.random.RandomState(1).randn(2, T, H, W, 3).astype(np.float32)
    ours = np.asarray(cuboid_reorder(jnp.asarray(x), cuboid, strategy))
    theirs = ref_reorder(torch.from_numpy(x), cuboid, strategy).numpy()
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.parametrize(
    "data_shape,cuboid,shift,strategy,padding_type",
    [
        ((8, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "zeros"),
        ((8, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "ignore"),
        ((7, 9, 9), (2, 4, 4), (0, 0, 0), ("l", "l", "l"), "ignore"),
        ((7, 9, 9), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "ignore"),
        ((8, 8, 8), (2, 4, 4), (0, 0, 0), ("d", "d", "d"), "zeros"),
    ],
)
def test_attention_mask_matches_reference(data_shape, cuboid, shift, strategy, padding_type):
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from prediff.models.cuboid_transformer.cuboid_transformer import (
        compute_cuboid_self_attention_mask as ref_mask,
    )

    theirs = (
        ref_mask(data_shape, cuboid, shift, strategy, padding_type, torch.device("cpu"))
        .numpy()
        .astype(bool)
    )
    ours = compute_cuboid_self_attention_mask(
        data_shape, cuboid, shift, strategy, padding_type
    )
    if ours is None:  # our fast-path: mask provably all-True
        assert theirs.all()
    else:
        np.testing.assert_array_equal(ours.astype(bool), theirs)


def test_mask_trivial_none():
    # axial pattern on latent shape, zeros padding, no shift -> no mask needed
    assert (
        compute_cuboid_self_attention_mask(
            (13, 16, 16), (13, 1, 1), (0, 0, 0), ("l", "l", "l"), "zeros"
        )
        is None
    )


def test_update_cuboid_size_shift_size():
    cs, ss = update_cuboid_size_shift_size((4, 8, 8), (8, 4, 4), (2, 2, 2), ("l", "d", "l"))
    assert cs == (4, 4, 4)
    assert ss == (0, 0, 2)  # clamped T; dilated H never shifts


def test_masked_softmax():
    scores = jnp.asarray(np.random.RandomState(2).randn(2, 3, 4, 4).astype(np.float32))
    mask = jnp.asarray(np.random.RandomState(3).rand(3, 4, 4) > 0.3)
    w = np.asarray(masked_softmax(scores, mask))
    m = np.broadcast_to(np.asarray(mask), w.shape)
    assert (w[~m] == 0).all()
    sums = w.sum(-1)
    valid_rows = m.any(-1)
    np.testing.assert_allclose(sums[valid_rows], 1.0, rtol=1e-5)


def test_padding_roundtrip():
    x = jnp.asarray(np.random.RandomState(4).randn(2, 7, 9, 9, 3).astype(np.float32))
    for ptype in ("zeros", "ignore", "nearest"):
        padded = generalize_padding(x, 1, 3, 3, ptype)
        assert padded.shape == (2, 8, 12, 12, 3)
        back = generalize_unpadding(padded, 1, 3, 3, ptype)
        assert back.shape == x.shape
        if ptype != "nearest":
            np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_nearest_padding_matches_reference():
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from prediff.models.utils import _generalize_padding, _generalize_unpadding

    x = np.random.RandomState(5).randn(2, 7, 9, 9, 3).astype(np.float32)
    ours = np.asarray(generalize_padding(jnp.asarray(x), 1, 3, 3, "nearest"))
    theirs = _generalize_padding(torch.from_numpy(x), 1, 3, 3, "nearest").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
    ours_u = np.asarray(generalize_unpadding(jnp.asarray(x), 1, 3, 3, "nearest"))
    theirs_u = _generalize_unpadding(torch.from_numpy(x), 1, 3, 3, "nearest").numpy()
    np.testing.assert_allclose(ours_u, theirs_u, rtol=1e-6)
