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


def test_sevir_download_offline_paths(tmp_path):
    """Download helpers must fail with actionable instructions offline and
    construct the published mirror URLs (ref sevir_torch_wrap.py:30-70)."""
    import subprocess
    import pytest
    from prediff_tpu.utils import download as dl

    assert dl.SEVIRLR_ZIP_URL.endswith("sevir_lr.zip")
    assert dl.SEVIR_S3_BUCKET == "s3://sevir"

    # sevirlr: zero egress here -> urlretrieve fails -> RuntimeError w/ URL
    with pytest.raises((RuntimeError, FileExistsError)) as ei:
        dl.download_sevirlr(str(tmp_path / "a"))
    if ei.type is RuntimeError:
        assert "sevir_lr.zip" in str(ei.value)

    # sevir: either no aws CLI (RuntimeError w/ manual commands) or cp fails
    with pytest.raises(RuntimeError):
        dl.download_sevir(str(tmp_path / "b"))

    # existing target dir is refused
    (tmp_path / "c" / "sevirlr").mkdir(parents=True)
    with pytest.raises(FileExistsError):
        dl.download_sevirlr(str(tmp_path / "c"))


def test_datamodule_prepare_data_offline(tmp_path):
    import pytest
    from prediff_tpu.datasets import SEVIRDataModule

    dm = SEVIRDataModule(sevir_dir=str(tmp_path / "sevirlr"))
    with pytest.raises(FileNotFoundError):
        dm.prepare_data(download=False)
    with pytest.raises((RuntimeError, ValueError)):
        dm.prepare_data(download=True)
    dm2 = SEVIRDataModule(sevir_dir=str(tmp_path / "somewhere_else"))
    with pytest.raises(ValueError):
        dm2.prepare_data(download=True)


def test_count_pallas_calls_fingerprint():
    """bench.py's kernel-gate guard (VERDICT r3 #7) rests on this jaxpr
    walk: pallas_call equations counted by kernel name, recursing through
    scan and custom_vjp sub-jaxprs; pure-XLA programs count empty.  An
    API drift here would only surface on the real-TPU bench otherwise."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prediff_tpu.ops import pallas_ffn
    from prediff_tpu.utils.profiling import count_pallas_calls

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(416, 256).astype(np.float32) * 0.5)
    ln_s = jnp.ones((256,), jnp.float32)
    ln_b = jnp.zeros((256,), jnp.float32)
    w1 = jnp.asarray(rs.randn(256, 1024).astype(np.float32) / 16.0)
    b1 = jnp.zeros((1024,), jnp.float32)
    w2 = jnp.asarray(rs.randn(1024, 256).astype(np.float32) / 32.0)
    b2 = jnp.zeros((256,), jnp.float32)

    def ffn(v):
        return pallas_ffn.fused_ffn(
            v, ln_s, ln_b, w1, b1, w2, b2, interpret=True)

    def fn(v):
        y = ffn(v)  # one equation at top level

        def body(c, _):
            return ffn(c), None  # one equation inside the scan body

        z, _ = jax.lax.scan(body, y, None, length=3)
        # one inside the custom_vjp primal sub-jaxpr
        u = pallas_ffn.fused_ffn_diff(
            z, ln_s, ln_b, w1, b1, w2, b2, 1e-5, "gelu", "bfloat16",
            True, False)
        return u + jnp.tanh(v)  # pure-XLA ops must NOT count

    assert count_pallas_calls(fn, x) == {"fused_ffn": 3}
    assert count_pallas_calls(lambda v: jnp.tanh(v) @ v.T, x) == {}
