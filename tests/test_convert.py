"""Checkpoint-converter unit tests (path mapping, EMA extraction, npz)."""
import numpy as np
import pytest

from prediff_tpu.utils.convert import (
    torch_key_to_flax_path,
    convert_torch_state_dict,
    extract_ema_state_dict,
)


def test_torch_key_folding():
    assert torch_key_to_flax_path("a.b.weight") == ("a", "b", "weight")
    assert torch_key_to_flax_path("down.0.1.attn_l.0.qkv.weight") == (
        "down_0_1", "attn_l_0", "qkv", "weight")
    assert torch_key_to_flax_path("layer.0.bias") == ("layer_0", "bias")
    assert torch_key_to_flax_path("ffn_1.weight") == ("ffn_1", "weight")


def test_convert_shapes_and_transposes():
    sd = {
        "lin.weight": np.arange(6, dtype=np.float32).reshape(2, 3),  # (out,in)
        "lin.bias": np.zeros(2, np.float32),
        "conv.weight": np.zeros((4, 3, 3, 3), np.float32),            # OIHW
        "norm.weight": np.ones(4, np.float32),
        "norm.bias": np.zeros(4, np.float32),
        "emb.weight": np.zeros((10, 4), np.float32),
    }
    target = {
        "lin": {"kernel": np.zeros((3, 2)), "bias": np.zeros(2)},
        "conv": {"kernel": np.zeros((3, 3, 3, 4))},
        "norm": {"scale": np.zeros(4), "bias": np.zeros(4)},
        "emb": {"embedding": np.zeros((10, 4))},
    }
    out = convert_torch_state_dict(sd, target, strict=False)
    np.testing.assert_array_equal(out["lin"]["kernel"], sd["lin.weight"].T)
    assert out["conv"]["kernel"].shape == (3, 3, 3, 4)
    np.testing.assert_array_equal(out["norm"]["scale"], np.ones(4))


def test_convert_strict_raises_on_mismatch():
    with pytest.raises(ValueError):
        convert_torch_state_dict(
            {"lin.weight": np.zeros((2, 3), np.float32)},
            {"lin": {"kernel": np.zeros((3, 2))}, "other": {"bias": np.zeros(1)}},
            strict=True,
        )
    with pytest.raises(ValueError):  # shape mismatch
        convert_torch_state_dict(
            {"lin.weight": np.zeros((2, 4), np.float32)},
            {"lin": {"kernel": np.zeros((3, 2))}},
        )


def test_extract_ema_state_dict():
    pl_sd = {
        "torch_nn_module.blocks.0.attn.qkv.weight": np.zeros(2),
        "torch_nn_module.final_proj.bias": np.zeros(2),
        "model_ema.blocks0attnqkvweight": np.ones(2),
        "model_ema.final_projbias": np.full(2, 3.0),
        "model_ema.decay": np.asarray(0.9999),
        "model_ema.num_updates": np.asarray(5),
    }
    ema = extract_ema_state_dict(pl_sd)
    assert set(ema) == {"blocks.0.attn.qkv.weight", "final_proj.bias"}
    np.testing.assert_array_equal(ema["blocks.0.attn.qkv.weight"], np.ones(2))


def test_extract_ema_matches_reference_litema_naming():
    from conftest import reference_available, import_reference

    if not reference_available():
        pytest.skip("reference not present")
    import_reference()
    import torch
    from prediff.utils.ema import LitEma

    model = torch.nn.Sequential(
        torch.nn.Linear(4, 8), torch.nn.LayerNorm(8), torch.nn.Linear(8, 2)
    )
    ema = LitEma(model)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(1.0)
    ema(model)  # one EMA update
    pl_sd = {f"torch_nn_module.{k}": v for k, v in model.state_dict().items()}
    pl_sd.update({f"model_ema.{k}": v for k, v in ema.state_dict().items()})
    out = extract_ema_state_dict(pl_sd)
    assert set(out) == set(model.state_dict().keys())
    # EMA value lies between init and updated params
    w = model.state_dict()["0.weight"].numpy()
    np.testing.assert_array_less(np.abs(out["0.weight"].numpy() - w).max(), 1.0)
