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


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask — single source of truth lives in
    pallas_ffn (the fwd/bwd mask-identity contract depends on both modules
    computing the exact same threshold/bitcast; advisor round-4)."""
    from .pallas_ffn import _keep_mask as _km

    return _km(shape, rate)


def _fold_seed(seed):
    from .pallas_ffn import _seed_words

    return _seed_words(seed)


def seed_prng(seed_ref, idx):
    from .pallas_ffn import seed_prng as _sp

    _sp(seed_ref, idx)


def _linear_cell_index(grid_rank: int):
    """Row-major linearization of the grid cell — the 2-word ``seed_prng``
    mixer takes ONE index (Mosaic rejects >2 prng_seed values, probe68).
    Forward and backward kernels share grid shape, so the same formula
    reproduces the same per-cell stream."""
    idx = pl.program_id(0)
    for d in range(1, grid_rank):
        idx = idx * pl.num_programs(d) + pl.program_id(d)
    return idx


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
            name="fused_cuboid_attention",
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
        name="fused_cuboid_attention",
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
            name="fused_cuboid_attention_grouped",
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
        name="fused_cuboid_attention_grouped",
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=cost, interpret=interpret,
    )(q, k, v, bias, mask)


def grouped_attention_reference(q, k, v, bias, mask=None, scale=1.0):
    """Pure-jnp reference of the grouped kernel's HEAD-MAJOR layout
    (B, heads, nC, vol, hc); masked_softmax semantics (p * mask)."""
    s = jnp.einsum("bhnic,bhnjc->bhnij", q * scale, k) + bias[None, :, None]
    if mask is not None:
        m = mask[None, None]
        s = jnp.where(m, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1) * m
    else:
        p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnij,bhnjc->bhnic", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_cuboid_attention_grouped_diff(q, k, v, bias, mask, scale=1.0,
                                        cuboids_per_block=8, interpret=False):
    """Differentiable grouped-scores kernel (mask may be None): forward = the
    Pallas kernel, backward = XLA autodiff of the reference (q/k/v/bias grads
    are ordinary einsums; the fusion win is forward-side)."""
    return fused_cuboid_attention_grouped(
        q, k, v, bias, mask=mask, scale=scale,
        cuboids_per_block=cuboids_per_block, interpret=interpret,
    )


def _grouped_diff_fwd(q, k, v, bias, mask, scale, cuboids_per_block, interpret):
    out = fused_cuboid_attention_grouped(
        q, k, v, bias, mask=mask, scale=scale,
        cuboids_per_block=cuboids_per_block, interpret=interpret,
    )
    return out, (q, k, v, bias, mask)


def _grouped_diff_bwd(scale, cuboids_per_block, interpret, res, g):
    q, k, v, bias, mask = res
    _, vjp = jax.vjp(
        lambda *a: grouped_attention_reference(*a, mask=mask, scale=scale),
        q, k, v, bias,
    )
    return vjp(g) + (None,)  # bool mask: zero cotangent


fused_cuboid_attention_grouped_diff.defvjp(_grouped_diff_fwd, _grouped_diff_bwd)


def _fused_layer_kernel(
    x_ref,        # (1, G, vol, C)
    ln_scale_ref,  # (C,)
    ln_bias_ref,   # (C,)
    wqkv_ref,      # (C, 3C)
    bias_ref,      # (heads, vol, vol)
    wproj_ref,     # (C, C)
    bproj_ref,     # (C,)
    o_ref,         # (1, G, vol, C)
    acc_ref,       # scratch (G*vol, C) fp32
    *, num_heads, scale, eps,
):
    G, vol, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    hc = C // num_heads
    x = x_ref[0].reshape(G * vol, C).astype(jnp.float32)
    # LayerNorm over C
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale_ref[...] + ln_bias_ref[...]
    # per-head attention; W_qkv columns are [q | k | v] each (C, C),
    # head h occupying columns h*hc:(h+1)*hc within its section
    for h in range(num_heads):
        wq = wqkv_ref[:, h * hc:(h + 1) * hc]
        wk = wqkv_ref[:, C + h * hc:C + (h + 1) * hc]
        wv = wqkv_ref[:, 2 * C + h * hc:2 * C + (h + 1) * hc]
        q = jax.lax.dot(ln, wq, preferred_element_type=jnp.float32).reshape(G, vol, hc)
        k = jax.lax.dot(ln, wk, preferred_element_type=jnp.float32).reshape(G, vol, hc)
        v = jax.lax.dot(ln, wv, preferred_element_type=jnp.float32).reshape(G, vol, hc)
        s = jax.lax.dot_general(
            q * scale, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) + bias_ref[h][None]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        oh = jax.lax.dot_general(
            p, v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, vol, hc)
        acc_ref[:, h * hc:(h + 1) * hc] = oh.reshape(G * vol, hc)
    out = jax.lax.dot(acc_ref[...], wproj_ref[...],
                      preferred_element_type=jnp.float32) + bproj_ref[...]
    o_ref[0] = out.reshape(G, vol, C).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "cuboids_per_block",
                              "eps", "interpret")
)
def fused_cuboid_attention_layer(
    x: jnp.ndarray,          # (B, nC, vol, C) reordered cuboids
    ln_scale: jnp.ndarray,   # (C,)
    ln_bias: jnp.ndarray,    # (C,)
    w_qkv: jnp.ndarray,      # (C, 3C)
    bias: jnp.ndarray,       # (heads, vol, vol) relative-position bias
    w_proj: jnp.ndarray,     # (C, C)
    b_proj: jnp.ndarray,     # (C,)
    num_heads: int,
    scale: float,
    cuboids_per_block: int = 16,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """v3: whole attention layer (LN + QKV + per-head attention + out-proj)
    as ONE kernel — attacks the per-op overhead that dominates B=1 latency.
    No-mask case (no shift / 'zeros' padding with exact divisibility), the
    v1 axial configuration."""
    B, nC, vol, C = x.shape
    G = cuboids_per_block
    while nC % G != 0:
        G //= 2
    G = max(G, 1)
    grid = (B, nC // G)
    kernel = functools.partial(
        _fused_layer_kernel, num_heads=num_heads, scale=scale, eps=eps
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_cuboid_attention_layer",
        in_specs=[
            pl.BlockSpec((1, G, vol, C), lambda b, n: (b, n, 0, 0)),
            pl.BlockSpec((C,), lambda b, n: (0,)),
            pl.BlockSpec((C,), lambda b, n: (0,)),
            pl.BlockSpec((C, 3 * C), lambda b, n: (0, 0)),
            pl.BlockSpec((num_heads, vol, vol), lambda b, n: (0, 0, 0)),
            pl.BlockSpec((C, C), lambda b, n: (0, 0)),
            pl.BlockSpec((C,), lambda b, n: (0,)),
        ],
        out_specs=pl.BlockSpec((1, G, vol, C), lambda b, n: (b, n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[pltpu.VMEM((G * vol, C), jnp.float32)] if _HAS_PLTPU else [],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nC * vol * C * (4 * C) + 4 * B * nC * vol * vol * C,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w_qkv.size + w_proj.size) * 4 * (B * nC // G),
            transcendentals=B * nC * num_heads * vol * vol,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj)


def _fused_layer_kernel_v4(
    x_ref,         # (1, G, vol, C)
    ln_scale_ref,  # (1, C)
    ln_bias_ref,   # (1, C)
    wqkv_ref,      # (C, 3C)
    bias_ref,      # (heads, vol, vol) relative-position bias (the param)
    rep_ref,       # (R, vol) static 0/1 replication matrix: rep[i, i%vol]=1
    maskadd_ref,   # (R, R) static additive mask: 0 on the block diagonal,
                   # NEG_INF elsewhere (R = G*vol)
    wproj_ref,     # (C, C)
    bproj_ref,     # (1, C)
    o_ref,         # (1, *dims, C) — any block whose flattened rows follow
                   #                 the (rep, maskadd) cuboid structure
    bm_ref,        # VMEM scratch (heads, R, R): expanded bias + mask
    *, num_heads, scale, eps, mxu_dtype, grid_rank=2,
    rate_attn=0.0, rate_proj=0.0, seed_ref=None,
):
    dims = x_ref.shape[1:-1]
    C = x_ref.shape[-1]
    R = int(np.prod(dims))
    hc = C // num_heads
    if seed_ref is not None:  # in-kernel PRNG dropout (round-4): unique
        # stream per grid cell; draw order = head 0..H-1 then proj
        seed_prng(seed_ref, _linear_cell_index(grid_rank))
    first_cell = pl.program_id(1) == 0
    for d in range(2, grid_rank):
        first_cell = jnp.logical_and(first_cell, pl.program_id(d) == 0)

    # Build the (bias + NEG_INF mask) matrices ONCE per kernel launch —
    # scratch persists across grid cells.  (Building them outside the kernel
    # re-tiled them on EVERY denoise step: XLA's loop-invariant code motion
    # never hoists broadcasts.  expanded = rep @ bias_h @ rep^T gathers
    # bias_h[pos(i), pos(j)] via two tiny MXU matmuls, where rep[r, pos(r)]=1
    # encodes each row's within-cuboid position — jnp.tile for the
    # cuboid-major layout, interleaved patterns for natural axial layouts.)
    @pl.when(first_cell)
    def _():
        rep = rep_ref[...]
        for h in range(num_heads):
            bm_ref[h] = jax.lax.dot(
                jax.lax.dot(rep, bias_ref[h], preferred_element_type=jnp.float32),
                rep.T, preferred_element_type=jnp.float32,
            ) + maskadd_ref[...]

    x = x_ref[0].reshape(R, C).astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale_ref[0].astype(jnp.float32) + ln_bias_ref[0].astype(jnp.float32)
    qkv = jax.lax.dot(
        ln.astype(mxu_dtype), wqkv_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    )  # (R, 3C)
    heads_out = []
    for h in range(num_heads):
        q = qkv[:, h * hc:(h + 1) * hc] * scale
        k = qkv[:, C + h * hc:C + (h + 1) * hc]
        v = qkv[:, 2 * C + h * hc:2 * C + (h + 1) * hc]
        # ONE dense (R, R) matmul across all G cuboids; cross-cuboid entries
        # are killed by the NEG_INF block off-diagonal.  At R<=256 the
        # (G x)-wasted FLOPs are trivial next to the MXU's
        # batched-tiny-matmul latency this avoids.
        s = jax.lax.dot_general(
            q.astype(mxu_dtype), k.astype(mxu_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bm_ref[h]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        if rate_attn > 0.0:
            p = p * _keep_mask((R, R), rate_attn) / (1.0 - rate_attn)
        heads_out.append(jax.lax.dot(
            p.astype(mxu_dtype), v.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        ))  # (R, hc)
    attn = jnp.concatenate(heads_out, axis=-1)  # (R, C)
    out = jax.lax.dot(
        attn.astype(mxu_dtype), wproj_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[0].astype(jnp.float32)
    if rate_proj > 0.0:
        out = out * _keep_mask((R, C), rate_proj) / (1.0 - rate_proj)
    o_ref[0] = out.reshape(dims + (C,)).astype(o_ref.dtype)


# Row budget for one v4 grid cell (tunable; probe36 measured 256 vs 416 as
# a wash on the chain, so keep the smaller VMEM footprint).
V4_MAX_ROWS = 256


def v4_vmem_bytes(R: int, vol: int, C: int, num_heads: int) -> int:
    """f32 bytes resident in one v4 grid cell: the (heads, R, R) bias+mask
    scratch, constant-index-map inputs (weights, rep, maskadd, bias), the
    token block in/out, and the QKV/attn intermediates."""
    return 4 * (
        num_heads * R * R        # VMEM scratch: expanded bias + mask
        + R * R + R * vol        # maskadd + rep inputs
        + 4 * C * C              # w_qkv (C,3C) + w_proj (C,C)
        + num_heads * vol * vol  # rel-pos bias param
        + 2 * R * C              # x block in / out
        + 4 * R * C              # qkv + concatenated head outputs
    )


def pick_cuboid_group(nC: int, vol: int, max_rows: Optional[int] = None,
                      C: Optional[int] = None,
                      num_heads: Optional[int] = None) -> Optional[int]:
    """Largest G dividing nC with G*vol <= max_rows, G*vol % 8 == 0 and —
    when (C, num_heads) are given — a VMEM footprint under budget (advisor
    round-2: oversized configs must fall back, not fail in Mosaic)."""
    from .dispatch import VMEM_BUDGET_BYTES

    if max_rows is None:
        max_rows = V4_MAX_ROWS
    best = None
    for g in range(1, nC + 1):
        if nC % g:
            continue
        r = g * vol
        if r > max_rows:
            break
        if C is not None and num_heads is not None and (
            v4_vmem_bytes(r, vol, C, num_heads) > VMEM_BUDGET_BYTES
        ):
            break  # bytes grow monotonically with r
        if r % 8 == 0:
            best = g
    return best


def build_blockdiag_biasmask(bias: jnp.ndarray, G: int) -> jnp.ndarray:
    """(heads, vol, vol) rel-pos bias -> (heads, G*vol, G*vol) with the bias
    tiled on the block diagonal and NEG_INF elsewhere.  Pure function of the
    bias param, so XLA hoists it out of sampling scans."""
    H, vol, _ = bias.shape
    R = G * vol
    eye = np.kron(np.eye(G, dtype=bool), np.ones((vol, vol), dtype=bool))
    tiled = jnp.tile(bias, (1, G, G))
    return jnp.where(jnp.asarray(eye)[None], tiled, NEG_INF).astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "eps", "mxu_dtype_name",
                              "interpret", "rate_attn", "rate_proj")
)
def fused_cuboid_attention_layer_v4(
    x: jnp.ndarray,          # (B, nC, vol, C) reordered cuboids
    ln_scale: jnp.ndarray,   # (C,)
    ln_bias: jnp.ndarray,    # (C,)
    w_qkv: jnp.ndarray,      # (C, 3C)
    bias: jnp.ndarray,       # (heads, vol, vol) relative-position bias
    w_proj: jnp.ndarray,     # (C, C)
    b_proj: jnp.ndarray,     # (C,)
    num_heads: int,
    scale: float,
    eps: float = 1e-5,
    mxu_dtype_name: str = "bfloat16",
    interpret: bool = False,
    seed: Optional[jnp.ndarray] = None,
    rate_attn: float = 0.0,
    rate_proj: float = 0.0,
) -> jnp.ndarray:
    """v4 whole attention layer: LN + one wide QKV dot + per-head DENSE
    (R, R) attention over G concatenated cuboids (block-diagonal bias/mask)
    + out-proj, one kernel.  Fixes v3's two losses: 12 narrow per-head
    QKV dots -> 1 wide dot, and G-batched tiny score matmuls -> one dense
    MXU matmul per head.  No-mask configurations only (v1 axial).
    With ``seed`` (real TPU only): in-kernel PRNG dropout on the attention
    weights (rate_attn) and the projected output (rate_proj)."""
    B, nC, vol, C = x.shape
    G = pick_cuboid_group(nC, vol, C=C, num_heads=num_heads)
    assert G is not None, "caller must gate with pick_cuboid_group()"
    grid = (B, nC // G)
    seeded = seed is not None
    kernel = functools.partial(
        _fused_layer_kernel_v4, num_heads=num_heads, scale=scale, eps=eps,
        mxu_dtype=jnp.dtype(mxu_dtype_name),
        rate_attn=rate_attn if seeded else 0.0,
        rate_proj=rate_proj if seeded else 0.0,
    )
    if seeded:
        base_kernel = kernel
        kernel = lambda s_ref, *refs: base_kernel(*refs, seed_ref=s_ref)  # noqa: E731
    R = G * vol
    # static (per shape) constants: replication matrix and additive mask
    rep_np = np.zeros((R, vol), np.float32)
    rep_np[np.arange(R), np.arange(R) % vol] = 1.0
    blockdiag = np.kron(np.eye(G, dtype=bool), np.ones((vol, vol), bool))
    maskadd_np = np.where(blockdiag, 0.0, NEG_INF).astype(np.float32)
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, G, vol, C), lambda b, n: (b, n, 0, 0)),
        pl.BlockSpec((1, C), lambda b, n: (0, 0)),
        pl.BlockSpec((1, C), lambda b, n: (0, 0)),
        pl.BlockSpec((C, 3 * C), lambda b, n: (0, 0)),
        pl.BlockSpec((num_heads, vol, vol), lambda b, n: (0, 0, 0)),
        pl.BlockSpec((R, vol), lambda b, n: (0, 0)),
        pl.BlockSpec((R, R), lambda b, n: (0, 0)),
        pl.BlockSpec((C, C), lambda b, n: (0, 0)),
        pl.BlockSpec((1, C), lambda b, n: (0, 0)),
    ]
    args = [x, row(ln_scale), row(ln_bias), w_qkv, bias.astype(jnp.float32),
            jnp.asarray(rep_np), jnp.asarray(maskadd_np), w_proj, row(b_proj)]
    if seeded:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, _fold_seed(seed))
    return pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_cuboid_attention_layer_v4",
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, G, vol, C), lambda b, n: (b, n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((num_heads, R, R), jnp.float32)] if _HAS_PLTPU else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nC * vol * C * 4 * C
            + 2 * 2 * B * (nC // G) * num_heads * R * R * (C // num_heads),
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w_qkv.size + w_proj.size) * 4,
            transcendentals=B * (nC // G) * num_heads * R * R,
        ),
        interpret=interpret,
    )(*args)


def _fused_layer_bwd_dx_kernel_v4(
    x_ref,         # (1, *dims, C)
    g_ref,         # (1, *dims, C) output cotangent
    ln_scale_ref,  # (1, C)
    ln_bias_ref,   # (1, C)
    wqkv_ref,      # (C, 3C)
    bias_ref,      # (heads, vol, vol)
    rep_ref,       # (R, vol)
    maskadd_ref,   # (R, R)
    wproj_ref,     # (C, C)
    dx_ref,        # (1, *dims, C)
    bm_ref,        # VMEM scratch (heads, R, R)
    *, num_heads, scale, eps, mxu_dtype, grid_rank=2,
):
    """dL/dx of the v4 whole-layer attention (no residual add inside the
    kernel, mirroring the forward).  All forward intermediates are recomputed
    in VMEM (flash-attention-style backward); only x and g stream from HBM."""
    dims = x_ref.shape[1:-1]
    C = x_ref.shape[-1]
    R = int(np.prod(dims))
    hc = C // num_heads
    first_cell = pl.program_id(1) == 0
    for d in range(2, grid_rank):
        first_cell = jnp.logical_and(first_cell, pl.program_id(d) == 0)

    @pl.when(first_cell)
    def _():
        rep = rep_ref[...]
        for h in range(num_heads):
            bm_ref[h] = jax.lax.dot(
                jax.lax.dot(rep, bias_ref[h], preferred_element_type=jnp.float32),
                rep.T, preferred_element_type=jnp.float32,
            ) + maskadd_ref[...]

    x = x_ref[0].reshape(R, C).astype(jnp.float32)
    g = g_ref[0].reshape(R, C).astype(jnp.float32)
    gamma = ln_scale_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    sigma_inv = jax.lax.rsqrt(var + eps)
    nhat = (x - mu) * sigma_inv
    ln = nhat * gamma + ln_bias_ref[0].astype(jnp.float32)
    qkv = jax.lax.dot(
        ln.astype(mxu_dtype), wqkv_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    )  # (R, 3C)
    dattn = jax.lax.dot_general(  # g @ wproj^T
        g.astype(mxu_dtype), wproj_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dq_cols, dk_cols, dv_cols = [], [], []
    for h in range(num_heads):
        qs = qkv[:, h * hc:(h + 1) * hc] * scale
        k = qkv[:, C + h * hc:C + (h + 1) * hc]
        v = qkv[:, 2 * C + h * hc:2 * C + (h + 1) * hc]
        s = jax.lax.dot_general(
            qs.astype(mxu_dtype), k.astype(mxu_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bm_ref[h]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        dOh = dattn[:, h * hc:(h + 1) * hc]
        dp = jax.lax.dot_general(  # dOh @ v^T
            dOh.astype(mxu_dtype), v.astype(mxu_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq_cols.append(jax.lax.dot(
            ds.astype(mxu_dtype), k.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        ) * scale)
        dk_cols.append(jax.lax.dot_general(  # ds^T @ qs
            ds.astype(mxu_dtype), qs.astype(mxu_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))
        dv_cols.append(jax.lax.dot_general(  # p^T @ dOh
            p.astype(mxu_dtype), dOh.astype(mxu_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))
    dqkv = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)  # (R, 3C)
    dln = jax.lax.dot_general(  # dqkv @ wqkv^T
        dqkv.astype(mxu_dtype), wqkv_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dnhat = dln * gamma
    dx = sigma_inv * (
        dnhat
        - jnp.mean(dnhat, axis=-1, keepdims=True)
        - nhat * jnp.mean(dnhat * nhat, axis=-1, keepdims=True)
    )
    dx_ref[0] = dx.reshape(dims + (C,)).astype(dx_ref.dtype)


def _largest_divisor(n: int, cap: int, align_with: int = 1) -> Optional[int]:
    """Largest d | n with d*align_with <= cap and (d*align_with) % 8 == 0."""
    best = None
    for d in range(1, n + 1):
        if n % d:
            continue
        r = d * align_with
        if r > cap:
            break
        if r % 8 == 0:
            best = d
    return best


def axial_attention_plan(shape, axis: int, num_heads: Optional[int] = None):
    """Grid/block/rep/mask plan for a single-axis ('axial') cuboid attention
    applied DIRECTLY to the natural (B, T, H, W, C) layout — no
    cuboid_reorder transpose.  Returns None when no aligned tiling exists
    (or, when ``num_heads`` is given, when the VMEM footprint is over budget).

    Every block contains only whole cuboids; rep[r, pos(r)] = 1 encodes each
    flattened row's position within its cuboid, and maskadd kills
    cross-cuboid score entries."""
    B, T, H, W, C = shape
    cap = max(V4_MAX_ROWS, 8)
    if axis == 0:      # cuboid (T,1,1): block = all T x a W-tile, grid over (H, W/wb)
        wb = _largest_divisor(W, max(cap, T), align_with=T)
        if wb is None:
            return None
        R = T * wb
        block = (1, T, 1, wb, C)
        grid_tail = (H, W // wb)
        index_map = lambda b, h, w: (b, 0, h, w, 0)  # noqa: E731
        pos = np.arange(R) // wb          # row r = (t, w): position = t
        same = (np.arange(R) % wb)[:, None] == (np.arange(R) % wb)[None]
        vol = T
    elif axis == 1:    # cuboid (1,H,1): block = k full t-slices
        k = _largest_divisor(T, max(cap, H * W), align_with=H * W)
        if k is None:
            return None
        R = k * H * W
        block = (1, k, H, W, C)
        grid_tail = (T // k,)
        index_map = lambda b, n: (b, n, 0, 0, 0)  # noqa: E731
        r = np.arange(R)
        pos = (r // W) % H                # row r = (t, h, w): position = h
        same = ((r // (H * W))[:, None] == (r // (H * W))[None]) \
            & ((r % W)[:, None] == (r % W)[None])
        vol = H
    elif axis == 2:    # cuboid (1,1,W): the natural layout IS cuboid-major —
        # the caller reshapes to (B, T*H, W, C) without data movement
        g = _largest_divisor(T * H, max(cap, W), align_with=W)
        if g is None:
            return None
        R = g * W
        block = (1, g, W, C)
        grid_tail = (T * H // g,)
        index_map = lambda b, n: (b, n, 0, 0)  # noqa: E731
        r = np.arange(R)
        pos = r % W
        same = (r // W)[:, None] == (r // W)[None]
        vol = W
    else:
        return None
    from .dispatch import VMEM_BUDGET_BYTES

    if num_heads is not None and (
        v4_vmem_bytes(R, vol, C, num_heads) > VMEM_BUDGET_BYTES
    ):
        return None  # fall back (reorder+v4 with smaller G, or einsum)
    rep = np.zeros((R, vol), np.float32)
    rep[np.arange(R), pos] = 1.0
    maskadd = np.where(same, 0.0, NEG_INF).astype(np.float32)
    return dict(block=block, grid_tail=grid_tail, index_map=index_map,
                rep=rep, maskadd=maskadd, vol=vol, R=R, axis=axis)


@functools.partial(
    jax.jit, static_argnames=("axis", "num_heads", "scale", "eps",
                              "mxu_dtype_name", "interpret", "rate_attn",
                              "rate_proj")
)
def fused_axial_attention_5d(
    x: jnp.ndarray,          # (B, T, H, W, C) natural layout
    axis: int,               # 0 (T), 1 (H) or 2 (W): the attention axis
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    bias: jnp.ndarray,       # (heads, vol, vol)
    w_proj: jnp.ndarray,
    b_proj: jnp.ndarray,
    num_heads: int,
    scale: float,
    eps: float = 1e-5,
    mxu_dtype_name: str = "bfloat16",
    interpret: bool = False,
    seed: Optional[jnp.ndarray] = None,
    rate_attn: float = 0.0,
    rate_proj: float = 0.0,
) -> jnp.ndarray:
    """v4 whole-layer attention on the NATIVE (B,T,H,W,C) layout for axial
    patterns — the cuboid reorder/reverse transposes (a real HBM copy for
    the T- and H-axis patterns) disappear into BlockSpec index maps.
    With ``seed``: in-kernel PRNG dropout (see fused_cuboid_attention_layer_v4)."""
    plan = axial_attention_plan(x.shape, axis, num_heads=num_heads)
    assert plan is not None, "caller must gate with axial_attention_plan()"
    B, T, H, W, C = x.shape
    x_in = x.reshape(B, T * H, W, C) if axis == 2 else x
    out_shape = x_in.shape
    grid = (B,) + plan["grid_tail"]
    seeded = seed is not None
    kernel = functools.partial(
        _fused_layer_kernel_v4, num_heads=num_heads, scale=scale, eps=eps,
        mxu_dtype=jnp.dtype(mxu_dtype_name), grid_rank=len(grid),
        rate_attn=rate_attn if seeded else 0.0,
        rate_proj=rate_proj if seeded else 0.0,
    )
    if seeded:
        base_kernel = kernel
        kernel = lambda s_ref, *refs: base_kernel(*refs, seed_ref=s_ref)  # noqa: E731
    vol, R = plan["vol"], plan["R"]
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda *idx, _n=len(shape): (0,) * _n)
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    in_specs = [
        pl.BlockSpec(plan["block"], plan["index_map"]),
        const((1, C)), const((1, C)),
        const((C, 3 * C)),
        const((num_heads, vol, vol)),
        const((R, vol)),
        const((R, R)),
        const((C, C)), const((1, C)),
    ]
    args = [x_in, row(ln_scale), row(ln_bias), w_qkv, bias.astype(jnp.float32),
            jnp.asarray(plan["rep"]), jnp.asarray(plan["maskadd"]),
            w_proj, row(b_proj)]
    if seeded:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, _fold_seed(seed))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_axial_attention_5d",
        in_specs=in_specs,
        out_specs=pl.BlockSpec(plan["block"], plan["index_map"]),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((num_heads, R, R), jnp.float32)] if _HAS_PLTPU else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * H * W * C * 4 * C
            + 2 * 2 * B * int(np.prod(plan["grid_tail"])) * num_heads * R * R
            * (C // num_heads),
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w_qkv.size + w_proj.size) * 4,
            transcendentals=B * int(np.prod(plan["grid_tail"])) * num_heads * R * R,
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(B, T, H, W, C) if axis == 2 else out


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "eps", "mxu_dtype_name",
                              "interpret")
)
def fused_cuboid_attention_layer_v4_bwd_dx(
    x: jnp.ndarray,          # (B, nC, vol, C) reordered cuboids
    g: jnp.ndarray,          # (B, nC, vol, C) output cotangent
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    bias: jnp.ndarray,
    w_proj: jnp.ndarray,
    num_heads: int,
    scale: float,
    eps: float = 1e-5,
    mxu_dtype_name: str = "bfloat16",
    interpret: bool = False,
) -> jnp.ndarray:
    B, nC, vol, C = x.shape
    G = pick_cuboid_group(nC, vol, C=C, num_heads=num_heads)
    assert G is not None, "caller must gate with pick_cuboid_group()"
    grid = (B, nC // G)
    kernel = functools.partial(
        _fused_layer_bwd_dx_kernel_v4, num_heads=num_heads, scale=scale,
        eps=eps, mxu_dtype=jnp.dtype(mxu_dtype_name),
    )
    R = G * vol
    rep_np = np.zeros((R, vol), np.float32)
    rep_np[np.arange(R), np.arange(R) % vol] = 1.0
    blockdiag = np.kron(np.eye(G, dtype=bool), np.ones((vol, vol), bool))
    maskadd_np = np.where(blockdiag, 0.0, NEG_INF).astype(np.float32)
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    tile = pl.BlockSpec((1, G, vol, C), lambda b, n: (b, n, 0, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_cuboid_attention_layer_v4_bwd_dx",
        in_specs=[
            tile, tile,
            pl.BlockSpec((1, C), lambda b, n: (0, 0)),
            pl.BlockSpec((1, C), lambda b, n: (0, 0)),
            pl.BlockSpec((C, 3 * C), lambda b, n: (0, 0)),
            pl.BlockSpec((num_heads, vol, vol), lambda b, n: (0, 0, 0)),
            pl.BlockSpec((R, vol), lambda b, n: (0, 0)),
            pl.BlockSpec((R, R), lambda b, n: (0, 0)),
            pl.BlockSpec((C, C), lambda b, n: (0, 0)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((num_heads, R, R), jnp.float32)] if _HAS_PLTPU else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * B * nC * vol * C * 4 * C
                       + 2 * 2 * B * (nC // G) * num_heads * R * R
                       * (C // num_heads)),
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + (w_qkv.size + w_proj.size) * 4,
            transcendentals=B * (nC // G) * num_heads * R * R,
        ),
        interpret=interpret,
    )(x, g, row(ln_scale), row(ln_bias), w_qkv, bias.astype(jnp.float32),
      jnp.asarray(rep_np), jnp.asarray(maskadd_np), w_proj)


@functools.partial(
    jax.jit, static_argnames=("axis", "num_heads", "scale", "eps",
                              "mxu_dtype_name", "interpret")
)
def fused_axial_attention_5d_bwd_dx(
    x: jnp.ndarray,          # (B, T, H, W, C) natural layout
    g: jnp.ndarray,
    axis: int,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    bias: jnp.ndarray,
    w_proj: jnp.ndarray,
    num_heads: int,
    scale: float,
    eps: float = 1e-5,
    mxu_dtype_name: str = "bfloat16",
    interpret: bool = False,
) -> jnp.ndarray:
    plan = axial_attention_plan(x.shape, axis, num_heads=num_heads)
    assert plan is not None, "caller must gate with axial_attention_plan()"
    B, T, H, W, C = x.shape
    x_in = x.reshape(B, T * H, W, C) if axis == 2 else x
    g_in = g.reshape(B, T * H, W, C) if axis == 2 else g
    grid = (B,) + plan["grid_tail"]
    kernel = functools.partial(
        _fused_layer_bwd_dx_kernel_v4, num_heads=num_heads, scale=scale,
        eps=eps, mxu_dtype=jnp.dtype(mxu_dtype_name), grid_rank=len(grid),
    )
    vol, R = plan["vol"], plan["R"]
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda *idx, _n=len(shape): (0,) * _n)
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    tile = pl.BlockSpec(plan["block"], plan["index_map"])
    out = pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_axial_attention_5d_bwd_dx",
        in_specs=[
            tile, tile,
            const((1, C)), const((1, C)),
            const((C, 3 * C)),
            const((num_heads, vol, vol)),
            const((R, vol)),
            const((R, R)),
            const((C, C)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(x_in.shape, x.dtype),
        scratch_shapes=(
            [pltpu.VMEM((num_heads, R, R), jnp.float32)] if _HAS_PLTPU else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=3 * (2 * B * T * H * W * C * 4 * C
                       + 2 * 2 * B * int(np.prod(plan["grid_tail"]))
                       * num_heads * R * R * (C // num_heads)),
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + (w_qkv.size + w_proj.size) * 4,
            transcendentals=B * int(np.prod(plan["grid_tail"])) * num_heads * R * R,
        ),
        interpret=interpret,
    )(x_in, g_in, row(ln_scale), row(ln_bias), w_qkv, bias.astype(jnp.float32),
      jnp.asarray(plan["rep"]), jnp.asarray(plan["maskadd"]),
      w_proj)
    return out.reshape(B, T, H, W, C) if axis == 2 else out


def _fused_layer_bwd_full_kernel_v4(
    x_ref,         # (1, *dims, C)
    g_ref,         # (1, *dims, C) output cotangent
    ln_scale_ref,  # (1, C)
    ln_bias_ref,   # (1, C)
    wqkv_ref,      # (C, 3C)
    bias_ref,      # (heads, vol, vol)
    rep_ref,       # (R, vol)
    maskadd_ref,   # (R, R)
    wproj_ref,     # (C, C)
    dx_ref,        # (1, *dims, C)
    dgamma_ref,    # (1, C)   f32, accumulated across the sequential grid
    dbeta_ref,     # (1, C)
    dwqkv_ref,     # (C, 3C)
    dbias_ref,     # (heads, vol, vol)
    dwproj_ref,    # (C, C)
    dbproj_ref,    # (1, C)
    bm_ref,        # VMEM scratch (heads, R, R)
    *, num_heads, scale, eps, mxu_dtype, grid_rank=2,
    rate_attn=0.0, rate_proj=0.0, seed_ref=None,
):
    """dL/d(everything) of the v4 whole-layer attention in ONE kernel — the
    TRAIN-path backward (probe65's FFN treatment generalized, VERDICT r3
    next-round #1): the dx backward already recomputes ln/qkv/p in VMEM, so
    every parameter grad is a few extra in-kernel contractions instead of the
    XLA recompute of the whole attention forward.  Parameter grads accumulate
    f32 into constant-index-map outputs over the sequential grid.

    dbias uses the same rep-matrix trick as the forward's bias expansion, in
    reverse: ds vanishes off the cuboid block diagonal (p is exactly 0 there),
    so dbias_h = rep^T @ ds_h @ rep gathers every (i, j) score-grad into its
    within-cuboid position pair — two tiny MXU matmuls per head."""
    dims = x_ref.shape[1:-1]
    C = x_ref.shape[-1]
    R = int(np.prod(dims))
    hc = C // num_heads
    # regenerate the forward's dropout masks: same seed/grid-cell stream,
    # masks drawn UPFRONT in the forward's order (head 0..H-1, then proj)
    m_heads, m_proj = None, None
    if seed_ref is not None:
        seed_prng(seed_ref, _linear_cell_index(grid_rank))
        if rate_attn > 0.0:
            m_heads = [_keep_mask((R, R), rate_attn)
                       for _ in range(num_heads)]
        if rate_proj > 0.0:
            m_proj = _keep_mask((R, C), rate_proj)
    first_cell = pl.program_id(1) == 0
    first_all = pl.program_id(0) == 0
    for d in range(2, grid_rank):
        first_cell = jnp.logical_and(first_cell, pl.program_id(d) == 0)
    first_all = jnp.logical_and(first_all, first_cell)

    @pl.when(first_cell)
    def _():
        rep_ = rep_ref[...]
        for h in range(num_heads):
            bm_ref[h] = jax.lax.dot(
                jax.lax.dot(rep_, bias_ref[h], preferred_element_type=jnp.float32),
                rep_.T, preferred_element_type=jnp.float32,
            ) + maskadd_ref[...]

    x = x_ref[0].reshape(R, C).astype(jnp.float32)
    g = g_ref[0].reshape(R, C).astype(jnp.float32)
    gamma = ln_scale_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    sigma_inv = jax.lax.rsqrt(var + eps)
    nhat = (x - mu) * sigma_inv
    ln = nhat * gamma + ln_bias_ref[0].astype(jnp.float32)
    qkv = jax.lax.dot(
        ln.astype(mxu_dtype), wqkv_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    )  # (R, 3C)
    do = g if m_proj is None else g * m_proj / (1.0 - rate_proj)
    dattn = jax.lax.dot_general(  # do @ wproj^T
        do.astype(mxu_dtype), wproj_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    rep = rep_ref[...]
    dq_cols, dk_cols, dv_cols = [], [], []
    attn_cols, dbias_heads = [], []
    for h in range(num_heads):
        qs = qkv[:, h * hc:(h + 1) * hc] * scale
        k = qkv[:, C + h * hc:C + (h + 1) * hc]
        v = qkv[:, 2 * C + h * hc:2 * C + (h + 1) * hc]
        s = jax.lax.dot_general(
            qs.astype(mxu_dtype), k.astype(mxu_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) + bm_ref[h]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        # p_d = the forward's (possibly dropout-masked) attention weights;
        # the softmax backward below still uses the unmasked p
        p_d = p if m_heads is None else p * m_heads[h] / (1.0 - rate_attn)
        dOh = dattn[:, h * hc:(h + 1) * hc]
        attn_cols.append(jax.lax.dot(  # the forward head output, for dwproj
            p_d.astype(mxu_dtype), v.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        ))
        dp = jax.lax.dot_general(  # dOh @ v^T
            dOh.astype(mxu_dtype), v.astype(mxu_dtype),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        if m_heads is not None:  # through the p-dropout
            dp = dp * m_heads[h] / (1.0 - rate_attn)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dbias_heads.append(jax.lax.dot(
            jax.lax.dot_general(  # rep^T @ ds -> (vol, R)
                rep, ds, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ),
            rep, preferred_element_type=jnp.float32,
        ))
        dq_cols.append(jax.lax.dot(
            ds.astype(mxu_dtype), k.astype(mxu_dtype),
            preferred_element_type=jnp.float32,
        ) * scale)
        dk_cols.append(jax.lax.dot_general(  # ds^T @ qs
            ds.astype(mxu_dtype), qs.astype(mxu_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))
        dv_cols.append(jax.lax.dot_general(  # p_d^T @ dOh
            p_d.astype(mxu_dtype), dOh.astype(mxu_dtype),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        ))
    dqkv = jnp.concatenate(dq_cols + dk_cols + dv_cols, axis=-1)  # (R, 3C)
    attn = jnp.concatenate(attn_cols, axis=-1)                    # (R, C)
    dln = jax.lax.dot_general(  # dqkv @ wqkv^T
        dqkv.astype(mxu_dtype), wqkv_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dnhat = dln * gamma
    dx = sigma_inv * (
        dnhat
        - jnp.mean(dnhat, axis=-1, keepdims=True)
        - nhat * jnp.mean(dnhat * nhat, axis=-1, keepdims=True)
    )
    dx_ref[0] = dx.reshape(dims + (C,)).astype(dx_ref.dtype)

    # ---- parameter-grad tiles (contract over this cell's rows) ----------- #
    dwproj_t = jax.lax.dot_general(  # attn^T @ do -> (C, C)
        attn.astype(mxu_dtype), do.astype(mxu_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dwqkv_t = jax.lax.dot_general(  # ln^T @ dqkv -> (C, 3C)
        ln.astype(mxu_dtype), dqkv.astype(mxu_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dbproj_t = jnp.sum(do, axis=0, keepdims=True)
    dgamma_t = jnp.sum(dln * nhat, axis=0, keepdims=True)
    dbeta_t = jnp.sum(dln, axis=0, keepdims=True)
    dbias_t = jnp.stack(dbias_heads)

    @pl.when(first_all)
    def _():
        dwproj_ref[...] = dwproj_t
        dwqkv_ref[...] = dwqkv_t
        dbproj_ref[...] = dbproj_t
        dgamma_ref[...] = dgamma_t
        dbeta_ref[...] = dbeta_t
        dbias_ref[...] = dbias_t

    @pl.when(jnp.logical_not(first_all))
    def _():
        dwproj_ref[...] += dwproj_t
        dwqkv_ref[...] += dwqkv_t
        dbproj_ref[...] += dbproj_t
        dgamma_ref[...] += dgamma_t
        dbeta_ref[...] += dbeta_t
        dbias_ref[...] += dbias_t


# like pallas_ffn.FULL_BWD_VMEM_LIMIT / pallas_resblock: the all-grads
# backward carries f32 dwqkv/dwproj accumulators and per-head unrolled-loop
# temporaries on the scoped-vmem STACK, so raise the per-kernel limit and
# budget the stack explicitly in the gate (probe58 lesson)
ATTN_FULL_BWD_VMEM_LIMIT = 100 * 1024 * 1024


def _v4_full_bwd_bytes(R: int, vol: int, C: int, num_heads: int) -> int:
    """f32 bytes live in one full-backward grid cell: the dx backward's set
    plus dwqkv/dwproj accumulators, the attn tile, and a stack allowance for
    the unrolled per-head s/p/ds/dp temporaries (every iteration's
    temporaries stay live on Mosaic's scoped-vmem stack)."""
    return 4 * (
        num_heads * R * R          # bm scratch
        + R * R + R * vol          # maskadd + rep
        + 2 * 4 * C * C            # w_qkv/w_proj staged + dwqkv/dwproj accs
        + 2 * num_heads * vol * vol  # bias in + dbias acc
        + 3 * R * C                # x, g, dx tiles
        + 8 * R * C                # qkv, dqkv, ln/nhat, attn, dattn, misc
        + 5 * num_heads * R * R    # stack: per-head s/p/ds/dp/partials
    )


def supports_v4_full_bwd(R: int, vol: int, C: int, num_heads: int) -> bool:
    return _v4_full_bwd_bytes(R, vol, C, num_heads) <= int(
        0.75 * ATTN_FULL_BWD_VMEM_LIMIT
    )


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "eps", "mxu_dtype_name",
                              "interpret", "rate_attn", "rate_proj")
)
def fused_cuboid_attention_layer_v4_bwd_full(
    x: jnp.ndarray,          # (B, nC, vol, C) reordered cuboids
    g: jnp.ndarray,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    bias: jnp.ndarray,
    w_proj: jnp.ndarray,
    num_heads: int,
    scale: float,
    eps: float = 1e-5,
    mxu_dtype_name: str = "bfloat16",
    interpret: bool = False,
    seed: Optional[jnp.ndarray] = None,
    rate_attn: float = 0.0,
    rate_proj: float = 0.0,
):
    """One-kernel backward of the v4 layer:
    (dx, dgamma, dbeta, dwqkv, dbias, dwproj, dbproj).  With ``seed``, the
    forward's in-kernel dropout masks are regenerated (same stream)."""
    B, nC, vol, C = x.shape
    G = pick_cuboid_group(nC, vol, C=C, num_heads=num_heads)
    assert G is not None, "caller must gate with pick_cuboid_group()"
    R = G * vol
    assert supports_v4_full_bwd(R, vol, C, num_heads), (
        "caller must gate with supports_v4_full_bwd()"
    )
    grid = (B, nC // G)
    seeded = seed is not None
    kernel = functools.partial(
        _fused_layer_bwd_full_kernel_v4, num_heads=num_heads, scale=scale,
        eps=eps, mxu_dtype=jnp.dtype(mxu_dtype_name),
        rate_attn=rate_attn if seeded else 0.0,
        rate_proj=rate_proj if seeded else 0.0,
    )
    if seeded:
        base_kernel = kernel
        kernel = lambda s_ref, *refs: base_kernel(*refs, seed_ref=s_ref)  # noqa: E731
    rep_np = np.zeros((R, vol), np.float32)
    rep_np[np.arange(R), np.arange(R) % vol] = 1.0
    blockdiag = np.kron(np.eye(G, dtype=bool), np.ones((vol, vol), bool))
    maskadd_np = np.where(blockdiag, 0.0, NEG_INF).astype(np.float32)
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    tile = pl.BlockSpec((1, G, vol, C), lambda b, n: (b, n, 0, 0))
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda *idx, _n=len(shape): (0,) * _n)
    f32 = jnp.float32
    in_specs = [
        tile, tile,
        const((1, C)), const((1, C)),
        const((C, 3 * C)),
        const((num_heads, vol, vol)),
        const((R, vol)),
        const((R, R)),
        const((C, C)),
    ]
    if seeded:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_cuboid_attention_layer_v4_bwd_full",
        in_specs=in_specs,
        out_specs=(
            tile,
            const((1, C)), const((1, C)),
            const((C, 3 * C)),
            const((num_heads, vol, vol)),
            const((C, C)), const((1, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, 3 * C), f32),
            jax.ShapeDtypeStruct((num_heads, vol, vol), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((num_heads, R, R), jnp.float32)] if _HAS_PLTPU else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * (2 * B * nC * vol * C * 4 * C
                       + 2 * 2 * B * (nC // G) * num_heads * R * R
                       * (C // num_heads)),
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + 2 * (w_qkv.size + w_proj.size) * 4,
            transcendentals=B * (nC // G) * num_heads * R * R,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=ATTN_FULL_BWD_VMEM_LIMIT)
            if pltpu is not None else None
        ),
        interpret=interpret,
    )(*([_fold_seed(seed)] if seeded else [])
      + [x, g, row(ln_scale), row(ln_bias), w_qkv, bias.astype(jnp.float32),
         jnp.asarray(rep_np), jnp.asarray(maskadd_np), w_proj])
    dx, dgamma, dbeta, dwqkv, dbias, dwproj, dbproj = outs
    return (
        dx,
        dgamma.reshape(-1).astype(ln_scale.dtype),
        dbeta.reshape(-1).astype(ln_bias.dtype),
        dwqkv.astype(w_qkv.dtype),
        dbias.astype(bias.dtype),
        dwproj.astype(w_proj.dtype),
        dbproj.reshape(-1).astype(ln_scale.dtype),
    )


@functools.partial(
    jax.jit, static_argnames=("axis", "num_heads", "scale", "eps",
                              "mxu_dtype_name", "interpret", "rate_attn",
                              "rate_proj")
)
def fused_axial_attention_5d_bwd_full(
    x: jnp.ndarray,          # (B, T, H, W, C) natural layout
    g: jnp.ndarray,
    axis: int,
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w_qkv: jnp.ndarray,
    bias: jnp.ndarray,
    w_proj: jnp.ndarray,
    num_heads: int,
    scale: float,
    eps: float = 1e-5,
    mxu_dtype_name: str = "bfloat16",
    interpret: bool = False,
    seed: Optional[jnp.ndarray] = None,
    rate_attn: float = 0.0,
    rate_proj: float = 0.0,
):
    """One-kernel all-grads backward on the natural axial layout.  With
    ``seed``, the forward's in-kernel dropout masks are regenerated."""
    plan = axial_attention_plan(x.shape, axis, num_heads=num_heads)
    assert plan is not None, "caller must gate with axial_attention_plan()"
    B, T, H, W, C = x.shape
    vol, R = plan["vol"], plan["R"]
    assert supports_v4_full_bwd(R, vol, C, num_heads), (
        "caller must gate with supports_v4_full_bwd()"
    )
    x_in = x.reshape(B, T * H, W, C) if axis == 2 else x
    g_in = g.reshape(B, T * H, W, C) if axis == 2 else g
    grid = (B,) + plan["grid_tail"]
    seeded = seed is not None
    kernel = functools.partial(
        _fused_layer_bwd_full_kernel_v4, num_heads=num_heads, scale=scale,
        eps=eps, mxu_dtype=jnp.dtype(mxu_dtype_name), grid_rank=len(grid),
        rate_attn=rate_attn if seeded else 0.0,
        rate_proj=rate_proj if seeded else 0.0,
    )
    if seeded:
        base_kernel = kernel
        kernel = lambda s_ref, *refs: base_kernel(*refs, seed_ref=s_ref)  # noqa: E731
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda *idx, _n=len(shape): (0,) * _n)
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    tile = pl.BlockSpec(plan["block"], plan["index_map"])
    f32 = jnp.float32
    in_specs = [
        tile, tile,
        const((1, C)), const((1, C)),
        const((C, 3 * C)),
        const((num_heads, vol, vol)),
        const((R, vol)),
        const((R, R)),
        const((C, C)),
    ]
    if seeded:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_axial_attention_5d_bwd_full",
        in_specs=in_specs,
        out_specs=(
            tile,
            const((1, C)), const((1, C)),
            const((C, 3 * C)),
            const((num_heads, vol, vol)),
            const((C, C)), const((1, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x_in.shape, x.dtype),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, 3 * C), f32),
            jax.ShapeDtypeStruct((num_heads, vol, vol), f32),
            jax.ShapeDtypeStruct((C, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
        ),
        scratch_shapes=(
            [pltpu.VMEM((num_heads, R, R), jnp.float32)] if _HAS_PLTPU else []
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * (2 * B * T * H * W * C * 4 * C
                       + 2 * 2 * B * int(np.prod(plan["grid_tail"]))
                       * num_heads * R * R * (C // num_heads)),
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + 2 * (w_qkv.size + w_proj.size) * 4,
            transcendentals=B * int(np.prod(plan["grid_tail"])) * num_heads
            * R * R,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=ATTN_FULL_BWD_VMEM_LIMIT)
            if pltpu is not None else None
        ),
        interpret=interpret,
    )(*([_fold_seed(seed)] if seeded else [])
      + [x_in, g_in, row(ln_scale), row(ln_bias), w_qkv,
         bias.astype(jnp.float32), jnp.asarray(plan["rep"]),
         jnp.asarray(plan["maskadd"]), w_proj])
    dx, dgamma, dbeta, dwqkv, dbias, dwproj, dbproj = outs
    if axis == 2:
        dx = dx.reshape(B, T, H, W, C)
    return (
        dx,
        dgamma.reshape(-1).astype(ln_scale.dtype),
        dbeta.reshape(-1).astype(ln_bias.dtype),
        dwqkv.astype(w_qkv.dtype),
        dbias.astype(bias.dtype),
        dwproj.astype(w_proj.dtype),
        dbproj.reshape(-1).astype(ln_scale.dtype),
    )


def cuboid_layer_attention_reference(x, ln_scale, ln_bias, w_qkv, bias,
                                     w_proj, b_proj, num_heads, scale,
                                     eps=1e-5):
    """Pure-jnp f32 reference of the whole-layer kernel semantics on
    (B, nC, vol, C) reordered cuboids: LN + QKV + per-cuboid softmax(qk+bias)v
    + out-proj, NO residual (matches the kernels; used for tests and for the
    XLA-recomputed parameter grads in the custom_vjp backward)."""
    B, nC, vol, C = x.shape
    hc = C // num_heads
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps) * ln_scale + ln_bias
    qkv = (ln @ w_qkv).reshape(B, nC, vol, 3, num_heads, hc)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    s = jnp.einsum("bnihc,bnjhc->bnhij", q * scale, k) + bias[None, None]
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnhij,bnjhc->bnihc", p, v).reshape(B, nC, vol, C)
    return (out @ w_proj + b_proj).astype(x.dtype)


_AXIAL_CUBOID_SIZE = {
    0: lambda T, H, W: (T, 1, 1),
    1: lambda T, H, W: (1, H, 1),
    2: lambda T, H, W: (1, 1, W),
}


def _axial_param_grads(x, g, axis, ln_scale, ln_bias, w_qkv, bias, w_proj,
                       num_heads, scale, eps):
    """XLA-recomputed (dγ, dβ, dWqkv, dbias, dWproj) for the axial kernel:
    reorder to cuboid-major (differentiable XLA transpose) and reuse the
    cuboid reference.  DCE'd when only dx is consumed (guidance)."""
    from .cuboid import cuboid_reorder, cuboid_reorder_reverse

    B, T, H, W, C = x.shape
    cs = _AXIAL_CUBOID_SIZE[axis](T, H, W)
    xr = cuboid_reorder(x, cuboid_size=cs, strategy=("l", "l", "l"))
    gr = cuboid_reorder(g, cuboid_size=cs, strategy=("l", "l", "l"))
    _, vjp = jax.vjp(
        lambda gam, bet, wq, bi, wp: cuboid_layer_attention_reference(
            xr, gam, bet, wq, bi, wp, jnp.zeros((C,), x.dtype), num_heads,
            scale, eps=eps,
        ),
        ln_scale, ln_bias, w_qkv, bias, w_proj,
    )
    return vjp(gr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_cuboid_attention_layer_v4_diff(
    x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
    num_heads, scale, eps=1e-5, mxu_dtype_name="bfloat16", interpret=False,
    full_bwd=False,
):
    """Differentiable v4 whole-layer attention (round-3): forward = the v4
    kernel; backward = fused Pallas dx kernel + XLA-recomputed param grads
    (DCE'd under input-only differentiation, e.g. alignment guidance), OR —
    with ``full_bwd`` (the TRAIN path, where parameter grads are known to be
    consumed) — ONE Pallas kernel computing dx and every parameter grad
    (round-4, probe65's FFN treatment generalized)."""
    return fused_cuboid_attention_layer_v4(
        x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj, num_heads, scale,
        eps=eps, mxu_dtype_name=mxu_dtype_name, interpret=interpret,
    )


def _v4_diff_fwd(x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
                 num_heads, scale, eps, mxu_dtype_name, interpret, full_bwd):
    out = fused_cuboid_attention_layer_v4(
        x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj, num_heads, scale,
        eps=eps, mxu_dtype_name=mxu_dtype_name, interpret=interpret,
    )
    return out, (x, ln_scale, ln_bias, w_qkv, bias, w_proj)


def _v4_diff_bwd(num_heads, scale, eps, mxu_dtype_name, interpret, full_bwd,
                 res, g):
    x, ln_scale, ln_bias, w_qkv, bias, w_proj = res
    B, nC, vol, C = x.shape
    if full_bwd:
        G = pick_cuboid_group(nC, vol, C=C, num_heads=num_heads)
        if G is not None and supports_v4_full_bwd(G * vol, vol, C, num_heads):
            dx, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj = (
                fused_cuboid_attention_layer_v4_bwd_full(
                    x, g, ln_scale, ln_bias, w_qkv, bias, w_proj, num_heads,
                    scale, eps=eps, mxu_dtype_name=mxu_dtype_name,
                    interpret=interpret,
                )
            )
            return dx, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj
    dx = fused_cuboid_attention_layer_v4_bwd_dx(
        x, g, ln_scale, ln_bias, w_qkv, bias, w_proj, num_heads, scale,
        eps=eps, mxu_dtype_name=mxu_dtype_name, interpret=interpret,
    )
    _, vjp = jax.vjp(
        lambda gam, bet, wq, bi, wp: cuboid_layer_attention_reference(
            x, gam, bet, wq, bi, wp, jnp.zeros((C,), x.dtype), num_heads,
            scale, eps=eps,
        ),
        ln_scale, ln_bias, w_qkv, bias, w_proj,
    )
    d_gamma, d_beta, dwqkv, dbias, dwproj = vjp(g)
    db_proj = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2)).astype(ln_scale.dtype)
    return dx, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj


fused_cuboid_attention_layer_v4_diff.defvjp(_v4_diff_fwd, _v4_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 8, 9, 10, 11, 12, 13))
def fused_axial_attention_5d_diff(
    x, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
    num_heads, scale, eps=1e-5, mxu_dtype_name="bfloat16", interpret=False,
    full_bwd=False,
):
    """Differentiable natural-layout axial whole-layer attention.  With
    ``full_bwd`` (train path) the backward is ONE Pallas kernel computing dx
    and every parameter grad; otherwise dx kernel + XLA-recomputed param
    grads (DCE'd under guidance)."""
    return fused_axial_attention_5d(
        x, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
        num_heads, scale, eps=eps, mxu_dtype_name=mxu_dtype_name,
        interpret=interpret,
    )


def _axial_diff_fwd(x, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
                    num_heads, scale, eps, mxu_dtype_name, interpret,
                    full_bwd):
    out = fused_axial_attention_5d(
        x, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
        num_heads, scale, eps=eps, mxu_dtype_name=mxu_dtype_name,
        interpret=interpret,
    )
    return out, (x, ln_scale, ln_bias, w_qkv, bias, w_proj)


def _axial_diff_bwd(axis, num_heads, scale, eps, mxu_dtype_name, interpret,
                    full_bwd, res, g):
    x, ln_scale, ln_bias, w_qkv, bias, w_proj = res
    if full_bwd:
        plan = axial_attention_plan(x.shape, axis, num_heads=num_heads)
        if plan is not None and supports_v4_full_bwd(
            plan["R"], plan["vol"], x.shape[-1], num_heads
        ):
            dx, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj = (
                fused_axial_attention_5d_bwd_full(
                    x, g, axis, ln_scale, ln_bias, w_qkv, bias, w_proj,
                    num_heads, scale, eps=eps,
                    mxu_dtype_name=mxu_dtype_name, interpret=interpret,
                )
            )
            return dx, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj
    dx = fused_axial_attention_5d_bwd_dx(
        x, g, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, num_heads, scale,
        eps=eps, mxu_dtype_name=mxu_dtype_name, interpret=interpret,
    )
    d_gamma, d_beta, dwqkv, dbias, dwproj = _axial_param_grads(
        x, g, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, num_heads, scale,
        eps,
    )
    db_proj = jnp.sum(
        g.astype(jnp.float32), axis=(0, 1, 2, 3)
    ).astype(ln_scale.dtype)
    return dx, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj


fused_axial_attention_5d_diff.defvjp(_axial_diff_fwd, _axial_diff_bwd)


def supports_attention_dropout(R: int, vol: int, C: int,
                               num_heads: int) -> bool:
    """In-kernel attention dropout needs a real TPU (pltpu.prng_* has no
    interpret lowering) and the full-backward VMEM budget (the backward is
    always the all-grads kernel — dropout only exists on the train path)."""
    return (
        _HAS_PLTPU
        and jax.default_backend() == "tpu"
        and supports_v4_full_bwd(R, vol, C, num_heads)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def fused_cuboid_attention_layer_v4_dropout_diff(
    x, seed, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
    num_heads, scale, eps=1e-5, rate_attn=0.0, rate_proj=0.0,
    mxu_dtype_name="bfloat16",
):
    """v4 whole-layer attention with in-kernel PRNG dropout on the attention
    weights and the projected output (round-4, VERDICT r3 #2).  TRAIN path
    only (real TPU; callers gate with supports_attention_dropout); backward
    is the one-kernel all-grads backward regenerating the identical masks
    from ``seed``.  Masks come from the TPU PRNG stream, not flax Dropout's
    threefry draws — an equally-valid, differently-drawn trajectory."""
    return fused_cuboid_attention_layer_v4(
        x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj, num_heads, scale,
        eps=eps, mxu_dtype_name=mxu_dtype_name, seed=seed,
        rate_attn=rate_attn, rate_proj=rate_proj,
    )


def _v4_dropout_diff_fwd(x, seed, ln_scale, ln_bias, w_qkv, bias, w_proj,
                         b_proj, num_heads, scale, eps, rate_attn, rate_proj,
                         mxu_dtype_name):
    out = fused_cuboid_attention_layer_v4(
        x, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj, num_heads, scale,
        eps=eps, mxu_dtype_name=mxu_dtype_name, seed=seed,
        rate_attn=rate_attn, rate_proj=rate_proj,
    )
    return out, (x, seed, ln_scale, ln_bias, w_qkv, bias, w_proj)


def _v4_dropout_diff_bwd(num_heads, scale, eps, rate_attn, rate_proj,
                         mxu_dtype_name, res, g):
    x, seed, ln_scale, ln_bias, w_qkv, bias, w_proj = res
    dx, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj = (
        fused_cuboid_attention_layer_v4_bwd_full(
            x, g, ln_scale, ln_bias, w_qkv, bias, w_proj, num_heads, scale,
            eps=eps, mxu_dtype_name=mxu_dtype_name, seed=seed,
            rate_attn=rate_attn, rate_proj=rate_proj,
        )
    )
    return dx, None, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj


fused_cuboid_attention_layer_v4_dropout_diff.defvjp(
    _v4_dropout_diff_fwd, _v4_dropout_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 9, 10, 11, 12, 13, 14))
def fused_axial_attention_5d_dropout_diff(
    x, seed, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
    num_heads, scale, eps=1e-5, rate_attn=0.0, rate_proj=0.0,
    mxu_dtype_name="bfloat16",
):
    """Natural-layout axial attention with in-kernel PRNG dropout (see
    fused_cuboid_attention_layer_v4_dropout_diff)."""
    return fused_axial_attention_5d(
        x, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
        num_heads, scale, eps=eps, mxu_dtype_name=mxu_dtype_name, seed=seed,
        rate_attn=rate_attn, rate_proj=rate_proj,
    )


def _axial_dropout_diff_fwd(x, seed, axis, ln_scale, ln_bias, w_qkv, bias,
                            w_proj, b_proj, num_heads, scale, eps,
                            rate_attn, rate_proj, mxu_dtype_name):
    out = fused_axial_attention_5d(
        x, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, b_proj,
        num_heads, scale, eps=eps, mxu_dtype_name=mxu_dtype_name, seed=seed,
        rate_attn=rate_attn, rate_proj=rate_proj,
    )
    return out, (x, seed, ln_scale, ln_bias, w_qkv, bias, w_proj)


def _axial_dropout_diff_bwd(axis, num_heads, scale, eps, rate_attn,
                            rate_proj, mxu_dtype_name, res, g):
    x, seed, ln_scale, ln_bias, w_qkv, bias, w_proj = res
    dx, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj = (
        fused_axial_attention_5d_bwd_full(
            x, g, axis, ln_scale, ln_bias, w_qkv, bias, w_proj, num_heads,
            scale, eps=eps, mxu_dtype_name=mxu_dtype_name, seed=seed,
            rate_attn=rate_attn, rate_proj=rate_proj,
        )
    )
    return dx, None, d_gamma, d_beta, dwqkv, dbias, dwproj, db_proj


fused_axial_attention_5d_dropout_diff.defvjp(
    _axial_dropout_diff_fwd, _axial_dropout_diff_bwd)


def cuboid_attention_reference(q, k, v, bias, mask=None, scale=1.0):
    """einsum reference with identical semantics (for tests/benches)."""
    s = jnp.einsum("bnhic,bnhjc->bnhij", q * scale, k) + bias[None, None]
    if mask is not None:
        s = jnp.where(mask[None, :, None], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1) * mask[None, :, None]
    else:
        p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bnhij,bnhjc->bnhic", p, v)
