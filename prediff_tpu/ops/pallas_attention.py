"""Fused cuboid self-attention Pallas TPU kernel.

One grid cell = one (batch, cuboid, head): computes
  softmax(q k^T * scale + bias [+ mask]) v
entirely in VMEM — scores never round-trip HBM.  The cuboid decomposition IS
the block structure (SURVEY.md §5: cuboid volumes are tiny, <= a few hundred,
so a whole cuboid's score matrix fits VMEM trivially; the win is fusing the
five ops the XLA path emits into one kernel).

Falls back to interpret mode off-TPU; the einsum path in
models/cuboid_attention.py remains the default — enable per-layer with
``use_pallas_attention=True`` after benchmarking on your shapes.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

NEG_INF = -1e18


def _attn_kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0, 0, 0].astype(jnp.float32) * scale   # (vol, hc)
    k = k_ref[0, 0, 0].astype(jnp.float32)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (vol, vol)
    s = s + bias_ref[0].astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0, 0] = o.astype(o_ref.dtype)


def _attn_kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale):
    q = q_ref[0, 0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0, 0].astype(jnp.float32)
    v = v_ref[0, 0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s + bias_ref[0].astype(jnp.float32)
    m = mask_ref[0]
    s = jnp.where(m, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    p = p * m  # fully-masked rows -> 0 (reference masked_softmax semantics)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0, 0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def fused_cuboid_attention(
    q: jnp.ndarray,                 # (B, nC, heads, vol, hc)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,              # (heads, vol, vol)
    mask: Optional[jnp.ndarray] = None,  # (nC, vol, vol) bool
    scale: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    B, nC, H, vol, hc = q.shape
    grid = (B, nC, H)
    qkv_spec = pl.BlockSpec(
        (1, 1, 1, vol, hc), lambda b, n, h: (b, n, h, 0, 0)
    )
    bias_spec = pl.BlockSpec((1, vol, vol), lambda b, n, h: (h, 0, 0))
    out_spec = pl.BlockSpec((1, 1, 1, vol, hc), lambda b, n, h: (b, n, h, 0, 0))
    cost = pl.CostEstimate(
        flops=2 * 2 * B * nC * H * vol * vol * hc,
        bytes_accessed=(3 * q.size + q.size) * q.dtype.itemsize,
        transcendentals=B * nC * H * vol * vol,
    )
    if mask is None:
        return pl.pallas_call(
            functools.partial(_attn_kernel_nomask, scale=scale),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v, bias)
    mask_spec = pl.BlockSpec((1, vol, vol), lambda b, n, h: (n, 0, 0))
    return pl.pallas_call(
        functools.partial(_attn_kernel_masked, scale=scale),
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v, bias, mask)


def _attn_kernel_grouped(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, has_mask,
                         mask_ref=None):
    # refs: (1, 1, G, vol, hc); bias (1, vol, vol); mask (G, vol, vol)
    q = q_ref[0, 0].astype(jnp.float32) * scale      # (G, vol, hc)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (G, vol, vol)
    s = s + bias_ref[0].astype(jnp.float32)[None]
    if has_mask:
        m = mask_ref[...]
        s = jnp.where(m, s, NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    if has_mask:
        p = p * mask_ref[...]
    o = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale", "cuboids_per_block", "interpret")
)
def fused_cuboid_attention_grouped(
    q: jnp.ndarray,                 # (B, heads, nC, vol, hc)  NOTE head-major
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,              # (heads, vol, vol)
    mask: Optional[jnp.ndarray] = None,  # (nC, vol, vol)
    scale: float = 1.0,
    cuboids_per_block: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """v2: G cuboids per grid cell as one batched dot — fills the MXU when
    cuboid volumes are tiny (axial patterns: vol 13-16)."""
    B, H, nC, vol, hc = q.shape
    G = cuboids_per_block
    while nC % G != 0:
        G //= 2
    G = max(G, 1)
    grid = (B, H, nC // G)
    qkv_spec = pl.BlockSpec((1, 1, G, vol, hc), lambda b, h, n: (b, h, n, 0, 0))
    bias_spec = pl.BlockSpec((1, vol, vol), lambda b, h, n: (h, 0, 0))
    out_spec = qkv_spec
    cost = pl.CostEstimate(
        flops=2 * 2 * B * nC * H * vol * vol * hc,
        bytes_accessed=4 * q.size * q.dtype.itemsize,
        transcendentals=B * nC * H * vol * vol,
    )
    if mask is None:
        kernel = functools.partial(_attn_kernel_grouped, scale=scale, has_mask=False)
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            cost_estimate=cost, interpret=interpret,
        )(q, k, v, bias)

    def kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref):
        _attn_kernel_grouped(q_ref, k_ref, v_ref, bias_ref, o_ref,
                             scale=scale, has_mask=True, mask_ref=mask_ref)

    mask_spec = pl.BlockSpec((G, vol, vol), lambda b, h, n: (n, 0, 0))
    return pl.pallas_call(
        kernel, grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=cost, interpret=interpret,
    )(q, k, v, bias, mask)


def cuboid_attention_reference(q, k, v, bias, mask=None, scale=1.0):
    """einsum reference with identical semantics (for tests/benches)."""
    s = jnp.einsum("bnhic,bnhjc->bnhij", q * scale, k) + bias[None, None]
    if mask is not None:
        s = jnp.where(mask[None, :, None], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1) * mask[None, :, None]
    else:
        p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnhij,bnhjc->bnhic", p, v)
