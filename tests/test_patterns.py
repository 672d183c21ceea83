"""Attention-pattern registry parity vs the reference."""
import pytest

from prediff_tpu.models.patterns import (
    CuboidSelfAttentionPatterns,
    CuboidCrossAttentionPatterns,
)

from conftest import reference_available, import_reference


def test_pattern_names_present():
    keys = CuboidSelfAttentionPatterns.list_keys()
    for name in ["full", "axial", "video_swin", "divided_st", "spatial_lg_v1",
                 "video_swin_2x4", "spatial_lg_8", "axial_space_dilate_2"]:
        assert name in keys
    for name in ["cross_1x1", "cross_8x8_lg", "cross_4x4_heter"]:
        assert name in CuboidCrossAttentionPatterns.list_keys()


@pytest.mark.parametrize("name", ["full", "axial", "video_swin", "divided_st",
                                  "spatial_lg_v1", "video_swin_4x8",
                                  "spatial_lg_2", "axial_space_dilate_4"])
@pytest.mark.parametrize("shape", [(13, 16, 16, 256), (6, 8, 8, 64), (2, 4, 4, 32)])
def test_self_patterns_match_reference(name, shape):
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    from prediff.models.cuboid_transformer.cuboid_transformer_patterns import (
        CuboidSelfAttentionPatterns as RefPatterns,
    )

    ours = CuboidSelfAttentionPatterns.get(name)(shape)
    theirs = RefPatterns.get(name)(shape)
    assert [tuple(c) for c in ours[0]] == [tuple(c) for c in theirs[0]]
    assert [tuple(c) for c in ours[1]] == [tuple(c) for c in theirs[1]]
    assert [tuple(c) for c in ours[2]] == [tuple(c) for c in theirs[2]]


@pytest.mark.parametrize("name", ["cross_1x1", "cross_4x4", "cross_8x8_lg",
                                  "cross_2x2_heter"])
def test_cross_patterns_match_reference(name):
    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    from prediff.models.cuboid_transformer.cuboid_transformer_patterns import (
        CuboidCrossAttentionPatterns as RefPatterns,
    )

    shape = (7, 16, 16, 256)
    ours = CuboidCrossAttentionPatterns.get(name)(shape)
    theirs = RefPatterns.get(name)(shape)
    for a, b in zip(ours, theirs):
        assert [tuple(x) if isinstance(x, (list, tuple)) else x for x in a] == \
               [tuple(x) if isinstance(x, (list, tuple)) else x for x in b]
