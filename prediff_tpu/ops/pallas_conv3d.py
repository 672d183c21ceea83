"""Fused 3x3x3 stride-1 SAME conv Pallas TPU kernel (round-3).

Motivation (probe48/50): at the B=1 sampling shapes XLA runs the UNet's
3-D convs at only ~19 TF/s — the t2d decomposition's (B*T,16,16,C) im2col
matmuls are too small to fill the MXU, and lax's native 3-D conv is worse
(9 TF/s at the 8x8x512 stage, the probe15 layout pathology).  The conv
budget is ~2.3 ms of the 5.99 ms sampling step — the largest single
headline lever left after round 2.

Kernel design — reshape-free shifted-row accumulation:

  * Zero-pad the (T,H,W,C) volume by 1 on each spatial side and flatten to
    rows (R = Tp*Hp*Wp, C) with C on lanes.
  * Output token (t,h,w) lives at padded-space row r = (t*Hp+h)*Wp + w and
    needs input row r + OFF(dt,dh,dw), OFF = (dt*Hp+dh)*Wp+dw.
  * So each of the 27 taps is one uniform row-shifted MXU dot:

        acc[0:rt] += xp[i*rt+OFF : i*rt+OFF+rt] @ w[tap]   # f32 accumulate

    — static-size dynamic sublane slices, no reshapes, no gathers, bf16
    operands.  The padded-space FLOP waste (R/THW, ~1.5x at 16x16x13) is
    the price of perfectly MXU-shaped dots; measured ~3-5x faster than the
    t2d path at B=1 (probe50).
  * Valid rows are extracted OUTSIDE the kernel by XLA (a slice of the
    (Tp,Hp,Wp,OC) reshape, fused into consumers).

Differentiable via custom_vjp: dx = the SAME kernel applied to the
cotangent with the flipped, channel-transposed weights (a SAME 3x3x3 conv
again); parameter grads via ``jax.vjp`` of the lax reference — under
input-only differentiation (knowledge-alignment guidance) XLA's DCE deletes
that whole recompute subgraph.

Reference parity: the torch convs in TimeEmbedResBlock
(src/prediff/models/time_embed.py:31, openaimodel.py:107) — numerically the
same SAME conv, zero padding.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def _plan(T: int, H: int, W: int, C: int, OC: int,
          bytes_per_el: int = 2) -> Optional[Tuple[int, int, int, int, int]]:
    """Choose (row_tile, n_rows, oc_tile, Rpad, L) or None if ineligible."""
    if C % 128 or OC % 128:
        return None
    Tp, Hp, Wp = T + 2, H + 2, W + 2
    R = Tp * Hp * Wp
    off_max = 2 * Hp * Wp + 2 * Wp + 2
    L = R - off_max
    n_rows = -(-L // 1024)
    per = -(-L // n_rows)
    rt = -(-per // 16) * 16  # ceil(L/n_rows) rounded up to sublane multiple
    oc_tile = OC
    while oc_tile > 128 and 27 * C * oc_tile * bytes_per_el > 6 * 1024 * 1024:
        oc_tile //= 2
    if OC % oc_tile:
        return None
    # off_pad: the window over-read rounded to a sublane multiple, so the
    # per-tile load start (i*rt) stays provably 8-aligned for Mosaic and the
    # 27 tap slices within the loaded window are STATIC (unaligned is fine
    # for static offsets)
    off_pad = -(-off_max // 8) * 8
    Rpad = n_rows * rt + off_pad
    return rt, n_rows, oc_tile, Rpad, L


def supports_shape(T: int, H: int, W: int, C: int, OC: int) -> bool:
    from .dispatch import VMEM_BUDGET_BYTES

    plan = _plan(T, H, W, C, OC)
    if plan is None:
        return False
    rt, n_rows, oc_tile, Rpad, L = plan
    off_pad = Rpad - n_rows * rt
    bytes_ = (
        Rpad * C * 2          # resident padded input (bf16)
        + 27 * C * oc_tile * 2  # resident weight block (bf16)
        + rt * oc_tile * (4 + 4 + 2)  # acc + out tile + a live dot operand
        + (rt + off_pad) * C * 2 * 2  # loaded window + a live tap slice
    )
    return bytes_ <= VMEM_BUDGET_BYTES


def _conv_kernel(xp_ref, w_ref, b_ref, o_ref, *, offs, rt, off_pad):
    i = pl.program_id(2)
    # one aligned windowed load (i*rt is a multiple of 16), then STATIC
    # unaligned tap slices of the loaded value
    win = xp_ref[0, pl.ds(i * rt, rt + off_pad), :]
    acc = jnp.zeros((rt, w_ref.shape[2]), jnp.float32)
    for tap, off in enumerate(offs):
        xs = win[off:off + rt]
        acc = acc + jax.lax.dot(
            xs, w_ref[tap], preferred_element_type=jnp.float32
        )
    o_ref[0] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def fused_conv3x3x3(x, kernel, bias, mxu_dtype_name: str = "bfloat16",
                    interpret: bool = False):
    """x (B,T,H,W,C), kernel (3,3,3,C,OC), bias (OC,) -> (B,T,H,W,OC).

    Caller must gate with :func:`supports_shape`."""
    B, T, H, W, C = x.shape
    OC = kernel.shape[-1]
    plan = _plan(T, H, W, C, OC)
    assert plan is not None, "caller must gate with supports_shape()"
    rt, n_rows, oc_tile, Rpad, L = plan
    Tp, Hp, Wp = T + 2, H + 2, W + 2
    R = Tp * Hp * Wp
    offs = [(dt * Hp + dh) * Wp + dw
            for dt in range(3) for dh in range(3) for dw in range(3)]
    dot_dtype = jnp.dtype(mxu_dtype_name)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))).reshape(B, R, C)
    xp = jnp.pad(xp, ((0, 0), (0, Rpad - R), (0, 0))).astype(dot_dtype)
    w = kernel.reshape(27, C, OC).astype(dot_dtype)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, offs=offs, rt=rt,
                          off_pad=Rpad - n_rows * rt),
        grid=(B, OC // oc_tile, n_rows),
        in_specs=[
            pl.BlockSpec((1, Rpad, C), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((27, C, oc_tile), lambda b, j, i: (0, 0, j)),
            pl.BlockSpec((1, oc_tile), lambda b, j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, rt, oc_tile), lambda b, j, i: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, n_rows * rt, OC), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 27 * B * n_rows * rt * C * OC,
            bytes_accessed=(B * Rpad * C + 27 * C * OC) * 2
            + B * n_rows * rt * OC * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w, bias.reshape(1, OC))
    # valid rows r=(t*Hp+h)*Wp+w: pad back to R, reshape, crop (fused by XLA)
    out = jnp.pad(out[:, :L], ((0, 0), (0, R - L), (0, 0)))
    return out.reshape(B, Tp, Hp, Wp, OC)[:, :T, :H, :W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_conv3x3x3_diff(x, kernel, bias, mxu_dtype_name: str = "bfloat16",
                         interpret: bool = False):
    """Differentiable fused conv: forward = the Pallas kernel; dx = the same
    kernel on the flipped/channel-transposed weights; dw/db via XLA
    recompute (DCE'd under input-only differentiation)."""
    return fused_conv3x3x3(x, kernel, bias, mxu_dtype_name=mxu_dtype_name,
                           interpret=interpret)


def _diff_fwd(x, kernel, bias, mxu_dtype_name, interpret):
    out = fused_conv3x3x3(x, kernel, bias, mxu_dtype_name=mxu_dtype_name,
                          interpret=interpret)
    return out, (x, kernel)


def _diff_bwd(mxu_dtype_name, interpret, res, g):
    x, kernel = res
    OC = kernel.shape[-1]
    # dx: SAME conv of the cotangent with flipped taps, in/out chans swapped
    k_t = kernel[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3)
    if supports_shape(*g.shape[1:], k_t.shape[-1]):
        dx = fused_conv3x3x3(g, k_t, jnp.zeros((k_t.shape[-1],), g.dtype),
                             mxu_dtype_name=mxu_dtype_name,
                             interpret=interpret)
    else:
        dx = conv3x3x3_reference(g, k_t, jnp.zeros((k_t.shape[-1],), g.dtype))
    # parameter grads: XLA recompute of the lax conv wrt kernel only
    _, vjp_w = jax.vjp(
        lambda k: conv3x3x3_reference(x, k, jnp.zeros((OC,), x.dtype)), kernel
    )
    (dw,) = vjp_w(g)
    db = jnp.sum(g.astype(jnp.float32), axis=(0, 1, 2, 3)).astype(g.dtype)
    return dx, dw, db


fused_conv3x3x3_diff.defvjp(_diff_fwd, _diff_bwd)


def conv3x3x3_reference(x, kernel, bias):
    """lax 3-D SAME conv (for tests and the bwd recompute)."""
    return lax.conv_general_dilated(
        x, kernel, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
        dimension_numbers=lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NTHWC", "THWIO", "NTHWC")),
    ) + bias
