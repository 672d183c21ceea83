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
    x_spec = pl.BlockSpec((1, tm, C), lambda b, i: (b, i, 0))
    emb_spec = pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0))
    gmat_spec = pl.BlockSpec((C, gp), lambda b, i: (0, 0))
    stats = pl.pallas_call(
        functools.partial(_stats_kernel, has_emb=has_emb,
                          inv_tile_count=1.0 / (tm * (C // groups))),
        grid=grid,
        in_specs=[x_spec, emb_spec, gmat_spec],
        out_specs=pl.BlockSpec((1, 3, gp), lambda b, i: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 3, gp), jnp.float32),
        interpret=interpret,
    )(x, emb_in, gmat)
    count = float(N * (C // groups))
    stats_spec = pl.BlockSpec((1, 3, gp), lambda b, i: (b, 0, 0))
    row_spec = pl.BlockSpec((1, C), lambda b, i: (0, 0))
    return pl.pallas_call(
        functools.partial(_apply_kernel, count=count, eps=eps,
                          has_emb=has_emb, silu=silu),
        grid=grid,
        in_specs=[x_spec, emb_spec, stats_spec, row_spec, row_spec, gmat_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * N * C, bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=B * N * C,
        ),
        interpret=interpret,
    )(x, emb_in, stats, scale.reshape(1, C), bias.reshape(1, C), gmat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def fused_groupnorm_silu_diff(x, scale, bias, emb, groups=32, eps=1e-5,
                              silu=True, interpret=False):
    """Differentiable fused GN(+emb)+SiLU (round-3): forward = the fused
    kernel pair; backward = XLA autodiff of the jnp reference (recompute).
    GN is ~2% of the step budget (COVERAGE.md) so a bespoke Pallas backward
    isn't warranted; this makes the op usable in training and under guidance
    gradients.  ``emb`` may be None (pass explicitly)."""
    return fused_groupnorm_silu(x, scale, bias, emb=emb, groups=groups,
                                eps=eps, silu=silu, interpret=interpret)


def _gn_diff_fwd(x, scale, bias, emb, groups, eps, silu, interpret):
    out = fused_groupnorm_silu(x, scale, bias, emb=emb, groups=groups,
                               eps=eps, silu=silu, interpret=interpret)
    return out, (x, scale, bias, emb)


def _gn_diff_bwd(groups, eps, silu, interpret, res, g):
    x, scale, bias, emb = res
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
