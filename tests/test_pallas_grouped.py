"""Grouped Pallas kernel equivalence (interpret mode)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from prediff_tpu.ops.pallas_attention import (
    fused_cuboid_attention_grouped,
    cuboid_attention_reference,
)
from prediff_tpu.ops.cuboid import compute_cuboid_self_attention_mask


@pytest.mark.parametrize("B,H,nC,vol,hc,G", [
    (2, 4, 16, 13, 64, 8),
    (1, 4, 13, 16, 64, 8),   # nC=13 prime -> G falls back to 1
    (2, 2, 8, 32, 16, 4),
])
def test_grouped_matches_einsum(B, H, nC, vol, hc, G):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, vol, vol).astype(np.float32))
    scale = hc**-0.5
    got = fused_cuboid_attention_grouped(q, k, v, bias, scale=scale,
                                         cuboids_per_block=G, interpret=True)
    # reference expects (B, nC, H, vol, hc)
    ref = cuboid_attention_reference(
        q.transpose(0, 2, 1, 3, 4), k.transpose(0, 2, 1, 3, 4),
        v.transpose(0, 2, 1, 3, 4), bias, scale=scale,
    ).transpose(0, 2, 1, 3, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_grouped_with_mask():
    mask_np = compute_cuboid_self_attention_mask(
        (8, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "ignore"
    )
    nC, vol, _ = mask_np.shape
    B, H, hc = 2, 4, 32
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, vol, vol).astype(np.float32))
    mask = jnp.asarray(mask_np)
    scale = hc**-0.5
    got = fused_cuboid_attention_grouped(q, k, v, bias, mask=mask, scale=scale,
                                         cuboids_per_block=8, interpret=True)
    ref = cuboid_attention_reference(
        q.transpose(0, 2, 1, 3, 4), k.transpose(0, 2, 1, 3, 4),
        v.transpose(0, 2, 1, 3, 4), bias, mask=mask, scale=scale,
    ).transpose(0, 2, 1, 3, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("with_mask", [False, True])
def test_grouped_diff_grads_match_xla_autodiff(with_mask):
    """custom_vjp of the grouped kernel (round-3): grads wrt q/k/v/bias match
    jax.grad of the reference, masked and unmasked."""
    from prediff_tpu.ops.pallas_attention import (
        fused_cuboid_attention_grouped_diff, grouped_attention_reference,
    )

    if with_mask:
        mask_np = compute_cuboid_self_attention_mask(
            (8, 8, 8), (2, 4, 4), (1, 2, 2), ("l", "l", "l"), "ignore"
        )
        mask = jnp.asarray(mask_np)
        nC, vol, _ = mask_np.shape
    else:
        mask, nC, vol = None, 16, 16
    B, H, hc = 1, 2, 32
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, vol, vol).astype(np.float32))
    g_out = jnp.asarray(rng.randn(B, H, nC, vol, hc).astype(np.float32))
    scale = hc**-0.5

    def loss_fused(q, k, v, bias):
        out = fused_cuboid_attention_grouped_diff(q, k, v, bias, mask, scale,
                                                  8, True)
        return jnp.sum(out * g_out)

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            grouped_attention_reference(q, k, v, bias, mask=mask, scale=scale)
            * g_out
        )

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for n, a, b in zip(("dq", "dk", "dv", "dbias"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)
