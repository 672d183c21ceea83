"""Fused GroupNorm(+emb add)+SiLU Pallas TPU kernels.

The TimeEmbedResBlock's norm/activation tail around each 3-D conv costs
~25 us per site on v5e as separate XLA ops (stats fusion with an x
passthrough write, emb-add, normalize, silu).  Two kernels replace it:

  gn_stats : per-(sample, group) sum / sum-of-squares, accumulated across
             token tiles in VMEM.  Per-group reductions run on the MXU via a
             constant 0/1 channel->group membership matrix (no awkward
             lane->sublane reshapes).
  gn_apply : (x + emb) -> normalize -> affine -> SiLU in one pass.

The optional ``emb`` (B, C) is folded into BOTH kernels, so the reference's
``h = h + emb_out`` (time_embed.py:134, non-scale-shift path) never
materializes in HBM.  Reference GN semantics: torch GroupNorm over
(C/groups x spatial) per sample, eps 1e-5.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - import guard mirrors pallas_attention.py
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

from .pallas_ffn import pick_token_tile


def _group_matrix(C: int, groups: int, gp: int) -> np.ndarray:
    """(C, gp) 0/1 membership; gp >= groups pads lanes to tile alignment
    (padded columns are all-zero, so they contribute nothing)."""
    m = np.zeros((C, gp), np.float32)
    m[np.arange(C), np.arange(C) // (C // groups)] = 1.0
    return m


def _stats_kernel(x_ref, emb_ref, gmat_ref, o_ref, *, has_emb, inv_tile_count):
    """Accumulates per-group stats SHIFTED by the first tile's group means:
    sums of (x - s) and (x - s)^2 with s fixed per (sample, group).  The naive
    single-pass E[x^2] - E[x]^2 cancels mantissa bits when |mean| >> std
    (advisor round-2); variance of the shifted values is identical but
    catastrophic cancellation is gone.  Output rows: [shifted sum, shifted
    sum-of-squares, shift]."""
    i = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    if has_emb:
        x = x + emb_ref[0].astype(jnp.float32)
    gm = gmat_ref[...]
    cs = jnp.sum(x, axis=0, keepdims=True)          # (1, C)

    @pl.when(i == 0)
    def _():
        # shift = tile-0 group mean; stays resident in the output block
        o_ref[0, 2:3] = jax.lax.dot(
            cs, gm, preferred_element_type=jnp.float32
        ) * inv_tile_count

    shift_g = o_ref[0, 2:3]                          # (1, gp)
    shift_c = jax.lax.dot_general(                   # expand to channels
        shift_g, gm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    xs = x - shift_c
    part = jnp.concatenate(
        [jax.lax.dot(jnp.sum(xs, axis=0, keepdims=True), gm,
                     preferred_element_type=jnp.float32),
         jax.lax.dot(jnp.sum(xs * xs, axis=0, keepdims=True), gm,
                     preferred_element_type=jnp.float32)],
        axis=0,
    )  # (2, groups)

    @pl.when(i == 0)
    def _():
        o_ref[0, 0:2] = part

    @pl.when(i > 0)
    def _():
        o_ref[0, 0:2] = o_ref[0, 0:2] + part


def _apply_kernel(x_ref, emb_ref, stats_ref, scale_ref, bias_ref, gmat_ref,
                  o_ref, *, count, eps, has_emb, silu):
    x = x_ref[0].astype(jnp.float32)
    if has_emb:
        x = x + emb_ref[0].astype(jnp.float32)
    gm_t = gmat_ref[...]                           # (C, groups)
    s = stats_ref[0]                                # (3, groups): see _stats_kernel
    shifted_mean_g = s[0:1] / count                 # (1, groups)
    mean_g = shifted_mean_g + s[2:3]                # add back the shift
    var_g = s[1:2] / count - shifted_mean_g * shifted_mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # expand per-group -> per-channel on the MXU
    mean_c = jax.lax.dot_general(
        mean_g, gm_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, C)
    inv_c = jax.lax.dot_general(
        inv_g, gm_t, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    y = (x - mean_c) * inv_c * scale_ref[0].astype(jnp.float32) \
        + bias_ref[0].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def supports_shape(tokens: int, C: int, groups: int) -> bool:
    return (
        C % 128 == 0
        and C % groups == 0
        and pick_token_tile(tokens, C) is not None
    )


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret")
)
def fused_groupnorm_silu(
    x: jnp.ndarray,              # (B, N, C) tokens per sample
    scale: jnp.ndarray,          # (C,)
    bias: jnp.ndarray,           # (C,)
    emb: Optional[jnp.ndarray] = None,   # (B, C), added BEFORE the norm
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """silu(GroupNorm(x + emb[:, None])) in two fused passes."""
    B, N, C = x.shape
    tm = pick_token_tile(N, C)
    assert tm is not None and C % 128 == 0 and C % groups == 0, (
        "caller must gate with supports_shape()"
    )
    gp = max(groups, 128)
    gmat = jnp.asarray(_group_matrix(C, groups, gp))
    has_emb = emb is not None
    emb_in = emb.reshape(B, 1, C) if has_emb else jnp.zeros((B, 1, C), x.dtype)
    grid = (B, N // tm)
    # Mosaic stacks ~6 block-sized f32 temporaries per cell; at the UNet's
    # (N=3328, C=256) GN shapes that is ~19.5 MB — over the 16 MB default
    # scoped-vmem limit, and the overflow only SURFACES at B>=16 (probe74;
    # B=8 compiles — Mosaic's accounting varies with grid extent).  Same
    # failure class as round-3's resblock probe58: invisible to interpret
    # mode, fixed by raising the limit (VMEM is 128 MB; full-bwd uses 100).
    params = ({} if interpret or pltpu is None else {"compiler_params":
              pltpu.CompilerParams(vmem_limit_bytes=GN_FWD_VMEM_LIMIT)})
    x_spec = pl.BlockSpec((1, tm, C), lambda b, i: (b, i, 0))
    emb_spec = pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0))
    gmat_spec = pl.BlockSpec((C, gp), lambda b, i: (0, 0))
    stats = pl.pallas_call(
        functools.partial(_stats_kernel, has_emb=has_emb,
                          inv_tile_count=1.0 / (tm * (C // groups))),
        grid=grid,
        name="fused_groupnorm_silu",
        in_specs=[x_spec, emb_spec, gmat_spec],
        out_specs=pl.BlockSpec((1, 3, gp), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 3, gp), jnp.float32),
        interpret=interpret,
        **params,
    )(x, emb_in, gmat)
    count = float(N * (C // groups))
    stats_spec = pl.BlockSpec((1, 3, gp), lambda b, i: (b, 0, 0))
    row_spec = pl.BlockSpec((1, C), lambda b, i: (0, 0))
    return pl.pallas_call(
        functools.partial(_apply_kernel, count=count, eps=eps,
                          has_emb=has_emb, silu=silu),
        grid=grid,
        name="fused_groupnorm_silu",
        in_specs=[x_spec, emb_spec, stats_spec, row_spec, row_spec, gmat_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * N * C, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * N * C,
        ),
        interpret=interpret,
        **params,
    )(x, emb_in, stats, scale.reshape(1, C), bias.reshape(1, C), gmat)


def _gn_bwd_full_kernel(
    x_ref,       # (1, N, C) the whole sample
    g_ref,       # (1, N, C) output cotangent
    emb_ref,     # (1, 1, C)
    scale_ref,   # (1, C)
    bias_ref,    # (1, C)
    gmat_ref,    # (C, gp)
    dx_ref,      # (1, N, C)
    dgamma_ref,  # (1, C)  f32, accumulated across the batch grid
    dbeta_ref,   # (1, C)
    demb_ref,    # (1, 1, C) per-sample (no accumulation)
    *, count, eps, has_emb, silu,
):
    """dL/d(x, scale, bias, emb) of silu(GroupNorm(x + emb)) in ONE kernel,
    whole sample resident in VMEM (round-4 VERDICT #1: replaces the XLA
    recompute backward).  Group stats are recomputed in-kernel via the 0/1
    membership matrix on the MXU; dgamma/dbeta accumulate f32 over the
    sequential batch grid."""
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    if has_emb:
        x = x + emb_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    gm = gmat_ref[...]  # (C, gp)

    # group stats (single pass is fine here: the whole sample is one tile, and
    # the mean subtraction below is exact in f32 for these magnitudes)
    sum_g = jax.lax.dot(jnp.sum(x, axis=0, keepdims=True), gm,
                        preferred_element_type=jnp.float32)  # (1, gp)
    mean_g = sum_g / count
    mean_c = jax.lax.dot_general(mean_g, gm, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)  # (1, C)
    xc = x - mean_c
    var_g = jax.lax.dot(jnp.sum(xc * xc, axis=0, keepdims=True), gm,
                        preferred_element_type=jnp.float32) / count
    inv_g = jax.lax.rsqrt(var_g + eps)
    inv_c = jax.lax.dot_general(inv_g, gm, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    nhat = xc * inv_c
    sc = scale_ref[0].astype(jnp.float32)
    y_pre = nhat * sc + bias_ref[0].astype(jnp.float32)
    if silu:
        sig = jax.nn.sigmoid(y_pre)
        dy = g * sig * (1.0 + y_pre * (1.0 - sig))
    else:
        dy = g
    dgamma_t = jnp.sum(dy * nhat, axis=0, keepdims=True)  # (1, C)
    dbeta_t = jnp.sum(dy, axis=0, keepdims=True)
    dxhat = dy * sc
    s1_g = jax.lax.dot(jnp.sum(dxhat, axis=0, keepdims=True), gm,
                       preferred_element_type=jnp.float32) / count
    s2_g = jax.lax.dot(jnp.sum(dxhat * nhat, axis=0, keepdims=True), gm,
                       preferred_element_type=jnp.float32) / count
    s1_c = jax.lax.dot_general(s1_g, gm, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    s2_c = jax.lax.dot_general(s2_g, gm, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dx = inv_c * (dxhat - s1_c - nhat * s2_c)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    demb_ref[0] = jnp.sum(dx, axis=0, keepdims=True).astype(demb_ref.dtype)

    @pl.when(b == 0)
    def _():
        dgamma_ref[...] = dgamma_t
        dbeta_ref[...] = dbeta_t

    @pl.when(b > 0)
    def _():
        dgamma_ref[...] += dgamma_t
        dbeta_ref[...] += dbeta_t


GN_FULL_BWD_VMEM_LIMIT = 100 * 1024 * 1024
GN_FWD_VMEM_LIMIT = 64 * 1024 * 1024


def supports_full_bwd(N: int, C: int, groups: int) -> bool:
    """The full backward keeps the whole (N, C) sample plus ~8 f32
    temporaries of the same shape live in VMEM at once."""
    if not supports_shape(N, C, groups):
        return False
    return 4 * 10 * N * C <= int(0.75 * GN_FULL_BWD_VMEM_LIMIT)


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "silu", "interpret")
)
def fused_groupnorm_silu_bwd_full(
    x: jnp.ndarray,              # (B, N, C)
    g: jnp.ndarray,              # (B, N, C)
    scale: jnp.ndarray,          # (C,)
    bias: jnp.ndarray,           # (C,)
    emb: Optional[jnp.ndarray] = None,   # (B, C)
    groups: int = 32,
    eps: float = 1e-5,
    silu: bool = True,
    interpret: bool = False,
):
    """One-kernel backward: (dx, dscale, dbias, demb or None)."""
    B, N, C = x.shape
    assert supports_full_bwd(N, C, groups), (
        "caller must gate with supports_full_bwd()"
    )
    gp = max(groups, 128)
    gmat = jnp.asarray(_group_matrix(C, groups, gp))
    has_emb = emb is not None
    emb_in = emb.reshape(B, 1, C) if has_emb else jnp.zeros((B, 1, C), x.dtype)
    sample = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0))
    embs = pl.BlockSpec((1, 1, C), lambda b: (b, 0, 0))
    const_row = pl.BlockSpec((1, C), lambda b: (0, 0))
    f32 = jnp.float32
    dx, dgamma, dbeta, demb = pl.pallas_call(
        functools.partial(_gn_bwd_full_kernel, count=float(N * (C // groups)),
                          eps=eps, has_emb=has_emb, silu=silu),
        grid=(B,),
        name="fused_groupnorm_silu_bwd_full",
        in_specs=[sample, sample, embs, const_row, const_row,
                  pl.BlockSpec((C, gp), lambda b: (0, 0))],
        out_specs=(sample, const_row, const_row, embs),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((B, 1, C), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * B * N * C, bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=B * N * C,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=GN_FULL_BWD_VMEM_LIMIT)
            if pltpu is not None else None
        ),
        interpret=interpret,
    )(x, g, emb_in, scale.reshape(1, C), bias.reshape(1, C), gmat)
    return (
        dx,
        dgamma.reshape(-1).astype(scale.dtype),
        dbeta.reshape(-1).astype(bias.dtype),
        demb.reshape(B, C).astype(emb.dtype) if has_emb else None,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def fused_groupnorm_silu_diff(x, scale, bias, emb, groups=32, eps=1e-5,
                              silu=True, interpret=False, full_bwd=False):
    """Differentiable fused GN(+emb)+SiLU (round-3): forward = the fused
    kernel pair; backward = XLA autodiff of the jnp reference (recompute),
    OR — with ``full_bwd`` (the train path, round-4) — ONE Pallas kernel
    computing dx, dscale, dbias and demb together.  ``emb`` may be None
    (pass explicitly)."""
    return fused_groupnorm_silu(x, scale, bias, emb=emb, groups=groups,
                                eps=eps, silu=silu, interpret=interpret)


def _gn_diff_fwd(x, scale, bias, emb, groups, eps, silu, interpret, full_bwd):
    out = fused_groupnorm_silu(x, scale, bias, emb=emb, groups=groups,
                               eps=eps, silu=silu, interpret=interpret)
    return out, (x, scale, bias, emb)


def _gn_diff_bwd(groups, eps, silu, interpret, full_bwd, res, g):
    x, scale, bias, emb = res
    if full_bwd and supports_full_bwd(x.shape[1], x.shape[2], groups):
        return fused_groupnorm_silu_bwd_full(
            x, g, scale, bias, emb=emb, groups=groups, eps=eps, silu=silu,
            interpret=interpret,
        )
    if emb is None:
        _, vjp = jax.vjp(
            lambda xx, sc, bi: fused_groupnorm_silu_reference(
                xx, sc, bi, emb=None, groups=groups, eps=eps, silu=silu),
            x, scale, bias,
        )
        return vjp(g) + (None,)
    _, vjp = jax.vjp(
        lambda xx, sc, bi, em: fused_groupnorm_silu_reference(
            xx, sc, bi, emb=em, groups=groups, eps=eps, silu=silu),
        x, scale, bias, emb,
    )
    return vjp(g)


fused_groupnorm_silu_diff.defvjp(_gn_diff_fwd, _gn_diff_bwd)


def fused_groupnorm_silu_reference(x, scale, bias, emb=None, groups=32,
                                   eps=1e-5, silu=True):
    """Pure-jnp f32 reference (torch GroupNorm semantics) for tests."""
    B, N, C = x.shape
    xf = x.astype(jnp.float32)
    if emb is not None:
        xf = xf + emb.astype(jnp.float32)[:, None]
    g = xf.reshape(B, N, groups, C // groups)
    mean = g.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(g - mean).mean(axis=(1, 3), keepdims=True)
    y = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(B, N, C)
    y = y * scale + bias
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)
