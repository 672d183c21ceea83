"""Fused Pallas cuboid-attention kernel vs the einsum reference (interpret
mode on CPU; the same kernel compiles with Mosaic on TPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.ops.pallas_attention import (
    fused_cuboid_attention,
    cuboid_attention_reference,
)
from prediff_tpu.ops.cuboid import compute_cuboid_self_attention_mask


@pytest.mark.parametrize("B,nC,H,vol,hc", [
    (2, 16, 4, 13, 64),   # axial-T on the v1 latent
    (1, 13, 4, 16, 64),   # axial-H/W
    (2, 8, 2, 32, 16),
])
def test_fused_attention_matches_einsum(B, nC, H, vol, hc):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, nC, H, vol, hc).astype(np.float32))
    k = jnp.asarray(rng.randn(B, nC, H, vol, hc).astype(np.float32))
    v = jnp.asarray(rng.randn(B, nC, H, vol, hc).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, vol, vol).astype(np.float32))
    scale = hc**-0.5
    got = fused_cuboid_attention(q, k, v, bias, scale=scale, interpret=True)
    expected = cuboid_attention_reference(q, k, v, bias, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_fused_attention_with_mask():
    # shifted-window mask from the real mask generator
    mask_np = compute_cuboid_self_attention_mask(
        (8, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "ignore"
    )
    nC, vol, _ = mask_np.shape
    B, H, hc = 2, 4, 32
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, nC, H, vol, hc).astype(np.float32))
    k = jnp.asarray(rng.randn(B, nC, H, vol, hc).astype(np.float32))
    v = jnp.asarray(rng.randn(B, nC, H, vol, hc).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, vol, vol).astype(np.float32))
    mask = jnp.asarray(mask_np)
    scale = hc**-0.5
    got = fused_cuboid_attention(q, k, v, bias, mask=mask, scale=scale, interpret=True)
    expected = cuboid_attention_reference(q, k, v, bias, mask=mask, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=2e-4, atol=2e-4)


def test_layer_pallas_flag_matches_einsum_path():
    from prediff_tpu.models.cuboid_attention import CuboidSelfAttentionLayer

    kw = dict(dim=32, num_heads=4, cuboid_size=(2, 4, 4), shift_size=(1, 2, 2),
              strategy=("l", "l", "l"), padding_type="ignore",
              attn_drop=0.0, proj_drop=0.0)
    base = CuboidSelfAttentionLayer(**kw)
    fused = CuboidSelfAttentionLayer(use_pallas_attention=True, **kw)
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 8, 32).astype(np.float32))
    params = base.init(jax.random.PRNGKey(0), x)["params"]
    out_base = base.apply({"params": params}, x)
    out_fused = fused.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_base),
                               rtol=5e-4, atol=5e-4)
