"""Test configuration: force an 8-virtual-device CPU backend BEFORE jax import
so sharding/multi-chip tests run anywhere (SURVEY.md §4: the reference has no
multi-device simulation; we test the mesh path on faked host devices)."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Some environments ship a sitecustomize that registers an accelerator plugin
# and force-overrides jax_platforms after import; pin it back to CPU here.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: on this 1-core host XLA CPU compiles dominate
# test wall time (even tiny-model flax init spends ~16 s compiling per-param
# initializer kernels — round-5 profiling).  Cache them across processes so
# the fast gate (`pytest -m fast`) and repeat runs stay fast.  Threshold
# overrides are needed because CPU compiles are individually quick/small.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_SRC = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SRC)


def import_reference():
    """Make the PyTorch reference importable for A/B parity tests only.

    The reference is never imported by the framework itself — tests compare
    numerics against it when it happens to be present on this machine.
    torchvision isn't installed here; stub just enough of it for the
    reference's LPIPS import chain (we never run that code path).
    """
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_models.vgg16 = None

        class _FakeWeights:
            IMAGENET1K_V1 = None

        tv_models.VGG16_Weights = _FakeWeights
        tv_transforms = types.ModuleType("torchvision.transforms")
        tv.models = tv_models
        tv.transforms = tv_transforms
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.transforms"] = tv_transforms

    if "torchmetrics" not in sys.modules:
        tm = types.ModuleType("torchmetrics")

        class _Metric:
            """Just enough of torchmetrics.Metric for the reference's
            SEVIRSkillScore: add_state -> plain attributes, update/compute
            called directly."""

            full_state_update = True

            def __init__(self, *a, **k):
                pass

            def add_state(self, name, default=None, dist_reduce_fx=None):
                setattr(self, name, default)

            def __call__(self, *a, **k):
                self.update(*a, **k)
                return self.compute()

        tm.Metric = _Metric
        tm.__path__ = []  # mark as package so torchmetrics.metric imports
        tm_metric = types.ModuleType("torchmetrics.metric")
        tm_metric.Metric = _Metric
        tm.metric = tm_metric
        tm_image = types.ModuleType("torchmetrics.image")
        tm_fid = types.ModuleType("torchmetrics.image.fid")

        def _compute_fid(mu1, sigma1, mu2, sigma2):
            raise NotImplementedError("stub")

        tm_fid._compute_fid = _compute_fid
        tm_image.fid = tm_fid
        tm.image = tm_image
        sys.modules["torchmetrics"] = tm
        sys.modules["torchmetrics.metric"] = tm_metric
        sys.modules["torchmetrics.image"] = tm_image
        sys.modules["torchmetrics.image.fid"] = tm_fid
