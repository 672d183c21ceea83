"""Fused 3x3x3 stride-1 SAME conv Pallas TPU kernel (round-3).

Purpose — op-COUNT reduction on the guidance path, not FLOPs.  probe47b:
the knowledge-alignment mean shift costs ~966 us device/step and half of
it is while-loop sequencing across ~500 tiny ops; each t2d conv site is
~8-11 tiny ops (3 2-D convs + pad/reshape glue), the largest op-count
block.  This kernel is ONE op per conv site (one more for the fused dx
under the guidance gradient).

HONEST NEGATIVE for raw speed (probe50/53): at the B=1 UNet sampling
shapes this kernel is ~1.5x SLOWER than t2d per site (130 vs 88.5 us true
at stage 0) — t2d already runs at ~133 TF/s there, near the v5e bf16
roofline.  Probes 48/50/51/52's apparent "t2d is MXU-starved at B=1"
readings were an artifact of K=50 benchmark scans: the relay's fixed
~24-34 ms dispatch+fetch cost divided by K inflated every per-iter number
by ~600 us (probe53 quantifies it; CLAUDE.md's N>=1000 rule exists for
exactly this).  So: keep t2d for the UNet; use this kernel where op count
dominates (the tiny alignment net under guidance).

Kernel design — reshape-free shifted-row im2col GEMM:

  * Zero-pad the (T,H,W,C) volume by 1 on each spatial side and flatten to
    rows (R = Tp*Hp*Wp, C) with C on lanes.
  * Output token (t,h,w) lives at padded-space row r = (t*Hp+h)*Wp + w and
    needs input row r + OFF(dt,dh,dw), OFF = (dt*Hp+dh)*Wp+dw.
  * Per row-tile: one aligned window load, 27 STATIC tap slices staged
    through VMEM scratch into an im2col block (rt, 27C), ONE big-K GEMM
    (probe51: per-tap (rt,C)@(C,OC) dots cap at ~23 TF/s on weight-reload
    latency; K=27C GEMMs reach 60-100 TF/s).
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
from jax.experimental.pallas import tpu as pltpu


def _plan(T: int, H: int, W: int, C: int, OC: int,
          bytes_per_el: int = 2) -> Optional[Tuple[int, int, int, int, int]]:
    """Choose (row_tile, n_rows, oc_tile, Rpad, L) or None if ineligible."""
    if C % 128 or OC % 128:
        return None
    Tp, Hp, Wp = T + 2, H + 2, W + 2
    R = Tp * Hp * Wp
    off_max = 2 * Hp * Wp + 2 * Wp + 2
    L = R - off_max
    # rt sized so the in-VMEM im2col block (rt, 27C) stays under ~4.5 MB
    # (probe51: only big-K GEMMs reach 60-100 TF/s on v5e; per-tap
    # (rt,C)@(C,OC) dots cap at ~23 TF/s on MXU weight-reload latency)
    def ceil16(v):
        return -(-v // 16) * 16

    rt_cap = (4_500_000 // (27 * C * bytes_per_el)) // 16 * 16
    if rt_cap < 16:
        return None
    n_rows = -(-L // rt_cap)
    rt = min(rt_cap, ceil16(-(-L // n_rows)))
    while n_rows * rt < L:  # ceil16-vs-cap rounding interplay
        n_rows += 1
        rt = min(rt_cap, ceil16(-(-L // n_rows)))
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


def supports_shape(T: int, H: int, W: int, C: int, OC: int,
                   B: int = 1) -> bool:
    from .dispatch import VMEM_BUDGET_BYTES

    plan = _plan(T, H, W, C, OC)
    if plan is None:
        return False
    rt, n_rows, oc_tile, Rpad, L = plan
    off_pad = Rpad - n_rows * rt
    # B>1: the padded-input block is re-fetched per batch element, so the
    # pipeline double-buffers it (measured: stage0 B=8 overflowed the 16 MB
    # scoped limit while B=1 compiled fine)
    xp_bufs = 2 if B > 1 else 1
    bytes_ = (
        xp_bufs * Rpad * C * 2  # resident padded input (bf16)
        + 27 * C * oc_tile * 2  # resident weight block (bf16)
        + rt * 27 * C * 2       # in-VMEM im2col scratch
        + (rt + off_pad) * C * 2  # loaded window
        + rt * oc_tile * (4 + 2 * 4)  # acc + double-buffered out tile
    )
    return bytes_ <= VMEM_BUDGET_BYTES


def _conv_kernel(xp_ref, w_ref, b_ref, o_ref, xcat_ref, *, offs, rt, off_pad):
    i = pl.program_id(2)
    C = xp_ref.shape[2]
    # one aligned windowed load (i*rt is a multiple of 16), then STATIC
    # unaligned tap slices staged through VMEM scratch (the stores normalize
    # each slice's sublane-offset layout — tpu.concatenate can't) into an
    # in-VMEM im2col block feeding ONE big-K GEMM (probe51: per-tap dots
    # cap at ~23 TF/s on weight-reload latency; K=27C GEMMs reach 60-100)
    win = xp_ref[0, pl.ds(i * rt, rt + off_pad), :]
    for tap, off in enumerate(offs):
        xcat_ref[:, tap * C:(tap + 1) * C] = win[off:off + rt]
    acc = jax.lax.dot(xcat_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)
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
    w = kernel.reshape(27 * C, OC).astype(dot_dtype)
    out = pl.pallas_call(
        functools.partial(_conv_kernel, offs=offs, rt=rt,
                          off_pad=Rpad - n_rows * rt),
        grid=(B, OC // oc_tile, n_rows),
        name="fused_conv3x3x3",
        in_specs=[
            pl.BlockSpec((1, Rpad, C), lambda b, j, i: (b, 0, 0)),
            pl.BlockSpec((27 * C, oc_tile), lambda b, j, i: (0, j)),
            pl.BlockSpec((1, oc_tile), lambda b, j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, rt, oc_tile), lambda b, j, i: (b, i, j)),
        out_shape=jax.ShapeDtypeStruct((B, n_rows * rt, OC), x.dtype),
        scratch_shapes=[pltpu.VMEM((rt, 27 * C), dot_dtype)],
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
    if supports_shape(*g.shape[1:], k_t.shape[-1], B=g.shape[0]):
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
