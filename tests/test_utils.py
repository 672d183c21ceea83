import pytest

from prediff_tpu.utils import Registry, parse_layout_shape, layout_to_in_out_slice


def test_registry_roundtrip():
    reg = Registry("things")

    @reg.register()
    def foo():
        return 42

    reg.register("bar", lambda: 7)
    assert reg.get("foo") is foo
    assert reg.create("bar") == 7
    assert "foo" in reg and len(reg) == 2
    with pytest.raises(KeyError):
        reg.get("missing")
    with pytest.raises(KeyError):
        reg.register("foo", foo)


def test_parse_layout_shape():
    d = parse_layout_shape("NTHWC")
    assert d == {"batch_axis": 0, "t_axis": 1, "h_axis": 2, "w_axis": 3, "c_axis": 4}
    d = parse_layout_shape("NHWC")
    assert d["t_axis"] == -1


def test_layout_to_in_out_slice():
    import numpy as np

    x = np.arange(2 * 13 * 4 * 4 * 1).reshape(2, 13, 4, 4, 1)
    in_slice, out_slice = layout_to_in_out_slice("NTHWC", in_len=7, out_len=6)
    assert x[in_slice].shape == (2, 7, 4, 4, 1)
    assert x[out_slice].shape == (2, 6, 4, 4, 1)
    np.testing.assert_array_equal(
        np.concatenate([x[in_slice], x[out_slice]], axis=1), x
    )
