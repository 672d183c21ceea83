"""Parity of cuboid self-attention (incl. shifted windows, dilated strategy,
'ignore' padding masks, and global-vector paths) vs the PyTorch reference."""
import numpy as np
import pytest

from conftest import reference_available, import_reference

if not reference_available():
    pytest.skip("reference not present", allow_module_level=True)

import_reference()
import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from prediff_tpu.utils.convert import convert_torch_state_dict  # noqa: E402
from prediff_tpu.models.cuboid_attention import (  # noqa: E402
    CuboidSelfAttentionLayer,
    StackCuboidSelfAttentionBlock,
)

torch.manual_seed(0)
RTOL, ATOL = 5e-4, 5e-4


def run_pair(ours, ref, jax_inputs, torch_inputs):
    variables = ours.init(jax.random.PRNGKey(0), *jax_inputs)
    params = convert_torch_state_dict(ref.state_dict(), variables["params"])
    got = ours.apply({"params": params}, *jax_inputs)
    with torch.no_grad():
        expected = ref(*torch_inputs)
    return got, expected


ATTN_CASES = [
    # (T,H,W), cuboid, shift, strategy, padding_type
    ((13, 16, 16), (13, 1, 1), (0, 0, 0), ("l", "l", "l"), "zeros"),
    ((13, 16, 16), (1, 16, 1), (0, 0, 0), ("l", "l", "l"), "zeros"),
    ((8, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "zeros"),
    ((8, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "ignore"),
    ((8, 8, 8), (2, 4, 4), (0, 0, 0), ("d", "d", "d"), "zeros"),
    ((7, 9, 9), (2, 4, 4), (0, 0, 0), ("l", "l", "l"), "ignore"),  # padding
    ((7, 9, 9), (2, 4, 4), (0, 0, 0), ("l", "l", "l"), "nearest"),
]


@pytest.mark.parametrize("shape,cuboid,shift,strategy,ptype", ATTN_CASES)
def test_cuboid_attention_parity(shape, cuboid, shift, strategy, ptype):
    from prediff.models.cuboid_transformer.cuboid_transformer import (
        CuboidSelfAttentionLayer as RefAttn,
    )

    dim, heads = 16, 4
    ref = RefAttn(dim=dim, num_heads=heads, cuboid_size=cuboid, shift_size=shift,
                  strategy=strategy, padding_type=ptype, attn_drop=0.0,
                  proj_drop=0.0, use_relative_pos=True).eval()
    ours = CuboidSelfAttentionLayer(
        dim=dim, num_heads=heads, cuboid_size=cuboid, shift_size=shift,
        strategy=strategy, padding_type=ptype, use_relative_pos=True,
    )
    T, H, W = shape
    x = np.random.RandomState(0).randn(2, T, H, W, dim).astype(np.float32)
    got, expected = run_pair(ours, ref, (jnp.asarray(x),), (torch.from_numpy(x),))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("separate,self_attn,dim_ratio", [
    (False, False, 1),
    (False, True, 1),
    (True, False, 1),
    (True, True, 1),
    (True, True, 2),
])
def test_cuboid_attention_global_vectors_parity(separate, self_attn, dim_ratio):
    from prediff.models.cuboid_transformer.cuboid_transformer import (
        CuboidSelfAttentionLayer as RefAttn,
    )

    dim, heads, num_global = 16, 4, 3
    kw = dict(dim=dim, num_heads=heads, cuboid_size=(2, 4, 4), shift_size=(0, 0, 0),
              strategy=("l", "l", "l"), padding_type="zeros",
              use_global_vector=True, use_global_self_attn=self_attn,
              separate_global_qkv=separate, global_dim_ratio=dim_ratio,
              use_relative_pos=True)
    ref = RefAttn(attn_drop=0.0, proj_drop=0.0, **kw).eval()
    ours = CuboidSelfAttentionLayer(**kw)
    x = np.random.RandomState(1).randn(2, 4, 8, 8, dim).astype(np.float32)
    gv = np.random.RandomState(2).randn(2, num_global, dim_ratio * dim).astype(np.float32)
    got, expected = run_pair(
        ours, ref, (jnp.asarray(x), jnp.asarray(gv)),
        (torch.from_numpy(x), torch.from_numpy(gv)),
    )
    np.testing.assert_allclose(np.asarray(got[0]), expected[0].numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got[1]), expected[1].numpy(), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("use_inter_ffn", [True, False])
def test_stack_block_parity(use_inter_ffn):
    from prediff.models.cuboid_transformer.cuboid_transformer import (
        StackCuboidSelfAttentionBlock as RefBlock,
    )

    dim, heads = 16, 4
    block_cuboid_size = [(13, 1, 1), (1, 16, 1), (1, 1, 16)]
    block_shift_size = [(0, 0, 0)] * 3
    block_strategy = [("l", "l", "l")] * 3
    ref = RefBlock(
        dim=dim, num_heads=heads, block_cuboid_size=block_cuboid_size,
        block_shift_size=block_shift_size, block_strategy=block_strategy,
        padding_type="zeros", attn_drop=0.0, proj_drop=0.0, ffn_drop=0.0,
        activation="gelu", use_inter_ffn=use_inter_ffn,
    ).eval()
    ours = StackCuboidSelfAttentionBlock(
        dim=dim, num_heads=heads, block_cuboid_size=block_cuboid_size,
        block_shift_size=block_shift_size, block_strategy=block_strategy,
        padding_type="zeros", activation="gelu", use_inter_ffn=use_inter_ffn,
    )
    x = np.random.RandomState(3).randn(2, 13, 16, 16, dim).astype(np.float32)
    got, expected = run_pair(ours, ref, (jnp.asarray(x),), (torch.from_numpy(x),))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=RTOL, atol=ATOL)


def test_stack_block_global_parity():
    from prediff.models.cuboid_transformer.cuboid_transformer import (
        StackCuboidSelfAttentionBlock as RefBlock,
    )

    dim, heads, num_global = 16, 4, 2
    kw = dict(
        dim=dim, num_heads=heads,
        block_cuboid_size=[(2, 4, 4), (2, 4, 4)],
        block_shift_size=[(0, 0, 0), (1, 2, 2)],
        block_strategy=[("d", "d", "d"), ("l", "l", "l")],
        padding_type="ignore", activation="gelu", use_inter_ffn=True,
        use_global_vector=True, use_global_vector_ffn=True,
        use_global_self_attn=True, separate_global_qkv=True, global_dim_ratio=1,
    )
    ref = RefBlock(attn_drop=0.0, proj_drop=0.0, ffn_drop=0.0, **kw).eval()
    ours = StackCuboidSelfAttentionBlock(**kw)
    x = np.random.RandomState(4).randn(2, 4, 8, 8, dim).astype(np.float32)
    gv = np.random.RandomState(5).randn(2, num_global, dim).astype(np.float32)
    got, expected = run_pair(
        ours, ref, (jnp.asarray(x), jnp.asarray(gv)),
        (torch.from_numpy(x), torch.from_numpy(gv)),
    )
    np.testing.assert_allclose(np.asarray(got[0]), expected[0].numpy(), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got[1]), expected[1].numpy(), rtol=RTOL, atol=ATOL)
