"""Config defaults vs the reference's shipped v1 YAMLs, and factory plumbing."""
import os

import numpy as np
import pytest
import yaml

from prediff_tpu.config import (
    prediff_default_config,
    vae_training_default_config,
    load_config,
    deep_merge,
    ConfigDict,
)

REF_PREDIFF_YAML = "/root/reference/scripts/prediff/sevirlr/prediff_sevirlr_v1.yaml"
REF_VAE_YAML = "/root/reference/scripts/vae/sevirlr/vae_sevirlr_v1.yaml"


def _compare_tree(ours, theirs, path=""):
    mismatches = []
    for k, v in theirs.items():
        p = f"{path}.{k}" if path else k
        if k not in ours:
            mismatches.append(f"missing {p}")
            continue
        ov = ours[k]
        if isinstance(v, dict) and isinstance(ov, dict):
            mismatches += _compare_tree(ov, v, p)
        elif isinstance(v, list):
            if list(ov or []) != list(v):
                mismatches.append(f"{p}: {ov!r} != {v!r}")
        elif isinstance(v, float) or isinstance(ov, float):
            if v is None or ov is None:
                if v != ov:
                    mismatches.append(f"{p}: {ov!r} != {v!r}")
            elif not np.isclose(float(ov), float(v)):
                mismatches.append(f"{p}: {ov!r} != {v!r}")
        elif ov != v:
            mismatches.append(f"{p}: {ov!r} != {v!r}")
    return mismatches


@pytest.mark.skipif(not os.path.exists(REF_PREDIFF_YAML), reason="reference absent")
def test_prediff_defaults_match_reference_v1_yaml():
    with open(REF_PREDIFF_YAML) as f:
        ref = yaml.safe_load(f)
    ours = prediff_default_config().to_dict()
    # fields whose keys exist only on one side by design
    ref["model"]["vae"].pop("down_block_types", None) and None
    # optim.monitor: the reference disagrees with itself — code default is
    # "valid_loss_epoch" (-avg CSI, train_sevirlr_prediff.py:510) while the
    # shipped v1 yaml overrides back to "val/loss" (:46).  We default to the
    # code value (CSI-based checkpoint selection); both metrics are logged.
    ref["optim"].pop("monitor", None)
    mism = _compare_tree(ours, ref)
    # timesteps/use_pallas etc. are extra keys on our side (allowed); all
    # reference keys must match exactly
    assert not mism, mism


@pytest.mark.skipif(not os.path.exists(REF_VAE_YAML), reason="reference absent")
def test_vae_defaults_match_reference_v1_yaml():
    # the reference vae yaml keeps VAE arch fields directly under model:
    with open(REF_VAE_YAML) as f:
        ref = yaml.safe_load(f)
    ours = vae_training_default_config().to_dict()
    ref_model = dict(ref["model"])
    ref_loss = ref_model.pop("loss", {})
    mism = _compare_tree(ours["model"]["vae"], ref_model, "model.vae")
    mism += _compare_tree(ours["model"]["loss"], ref_loss, "model.loss")
    for section in ("dataset", "layout"):
        if section in ref:
            mism += _compare_tree(ours.get(section, {}), ref[section], section)
    assert not mism, mism


def test_deep_merge_and_attr_access():
    base = {"a": {"b": 1, "c": [1, 2]}, "d": 5}
    out = deep_merge(base, {"a": {"b": 7}})
    assert out["a"]["b"] == 7 and out["a"]["c"] == [1, 2] and out["d"] == 5
    cd = ConfigDict.wrap(out)
    assert cd.a.b == 7
    cd2 = load_config(lambda: ConfigDict.wrap(base), None)
    assert cd2.d == 5


def test_factory_tiny_pipeline():
    import jax
    import jax.numpy as jnp
    from prediff_tpu.config import load_config, prediff_default_config
    from prediff_tpu.factory import build_pipeline

    cfg = load_config(prediff_default_config,
                      os.path.join(os.path.dirname(__file__), "..", "configs",
                                   "tiny_smoke.yaml"))
    ld, params = build_pipeline(cfg, with_alignment=True)
    assert set(params) == {"unet", "vae", "align"}
    y = jnp.zeros((1, 3, 32, 32, 1))
    out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(0), y,
                    timesteps=2)
    assert out.shape == (1, 2, 32, 32, 1)
