"""Fused whole-TimeEmbedResBlock Pallas TPU kernel (round-3).

Purpose — op-COUNT reduction on the knowledge-alignment guidance path.
probe47b/54: the guidance mean shift adds ~536 us/step in-chain, spread
over ~500 tiny alignment fwd+bwd ops; the largest remaining block after
the fused attention/FFN kernels is the two TimeEmbedResBlocks — each is
~25 XLA ops forward (2 GroupNorm kernel pairs, 2 t2d convs = 6 2-D convs
+ pad/reshape glue, SiLU/emb/skip elementwise) and ~50 backward (the GN
custom_vjp falls back to XLA-recompute, the conv dx is a transposed t2d).
This kernel computes the ENTIRE block

    out = x + conv2( silu(GN2( conv1( silu(GN1(x)) ) + b1 + emb )) ) + b2

in ONE Pallas call, and its input/emb gradient in ONE more (flash-style:
the backward recomputes the normalizations from the saved conv1 output and
runs both transposed convs in-kernel).  Parameter gradients come from
``jax.vjp`` of the jnp reference — under input-only differentiation
(guidance) XLA's DCE deletes that whole recompute subgraph.

Geometry follows ops/pallas_conv3d.py: the (T,H,W,C) volume is zero-padded
by 1 per spatial axis and flattened to "natural" rows (Tp*Hp*Wp, C) with C
on lanes; a SAME 3x3x3 conv then reads, for output token at padded-corner
row r, the 27 static tap rows r+OFF and the result for token (t,h,w) is
written back at natural row r + OFF(1,1,1), which re-creates a zero-padded
volume in place for the NEXT conv.  Invalid (ring) rows are forced to zero
with a precomputed 0/1 row mask so padding semantics and GroupNorm counts
match the unpadded reference exactly.

Eligibility (see supports_shape): identity skip (C == out_channels),
C % 128 == 0, non-scale-shift embedding, inactive dropout, and the whole
working set within the VMEM budget — in practice the alignment network's
two resblocks (128ch @ 6x16x16, 256ch @ 6x8x8).  The UNet's resblocks are
far over budget and keep the t2d path (which is near-roofline there,
probe53).

Reference parity: TimeEmbedResBlock, non-scale-shift path
(src/prediff/models/time_embed.py:31, forward :134; openaimodel.py:107).
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_conv3d import conv3x3x3_reference


ET = 128  # elementwise / stats row tile

# Mosaic compiles the kernels' unrolled Python loops with every iteration's
# temporaries live on the scoped-vmem stack (measured: 23.2 MB for the
# forward at the (6,16,16,128) alignment shape vs the 16 MB default limit),
# so the pallas_calls raise the per-kernel VMEM limit and the gates below
# budget the STACK as well as the declared buffers.
KERNEL_VMEM_LIMIT = 100 * 1024 * 1024  # v5e VMEM is 128 MiB
_STACK_HEADROOM = 0.75  # gate stack estimates to 75% of the raised limit


def _ceil(a: int, b: int) -> int:
    return -(-a // b)


def _plan(T: int, H: int, W: int, C: int) -> Optional[Tuple]:
    """(rt, n_rows, off_center, off_pad, Rpad, L, R, offs) or None."""
    if C % 128:
        return None
    Tp, Hp, Wp = T + 2, H + 2, W + 2
    R = Tp * Hp * Wp
    off_max = 2 * Hp * Wp + 2 * Wp + 2
    off_center = Hp * Wp + Wp + 1
    L = R - off_max
    # conv row tile: (rt, 27C) im2col block <= ~1.4 MB bf16 (sized so the
    # 256-channel backward, with both transposed weights resident, stays
    # under the VMEM budget at B=1)
    rt = min((1_400_000 // (27 * C * 2)) // 16 * 16, _ceil(L, 16) * 16)
    if rt < 16:
        return None
    n_rows = _ceil(L, rt)
    off_pad = _ceil(off_max, 8) * 8
    Rpad = _ceil(n_rows * rt + off_pad, ET) * ET
    offs = tuple(
        (dt * Hp + dh) * Wp + dw
        for dt in range(3) for dh in range(3) for dw in range(3)
    )
    return rt, n_rows, off_center, off_pad, Rpad, L, R, offs


def _fwd_bytes(T, H, W, C, B):
    plan = _plan(T, H, W, C)
    if plan is None:
        return None
    rt, n_rows, off_center, off_pad, Rpad, L, R, offs = plan
    io_bufs = 2 if B > 1 else 1  # Mosaic double-buffers batch-indexed blocks
    return (
        io_bufs * Rpad * C * 2      # xp in (bf16 at most; x dtype)
        + io_bufs * Rpad * C * 2    # out
        + io_bufs * Rpad * C * 2    # h2 residual out (dot dtype)
        + Rpad * C * 2              # h1/h3 scratch
        + rt * 27 * C * 2           # im2col scratch
        + 2 * 27 * C * C * 2        # w1, w2 resident
        + Rpad * 4                  # row mask
        + 16 * C * 4                # channel-stat scratch rows
    )


def _bwd_bytes(T, H, W, C, B):
    plan = _plan(T, H, W, C)
    if plan is None:
        return None
    rt, n_rows, off_center, off_pad, Rpad, L, R, offs = plan
    io_bufs = 2 if B > 1 else 1
    return (
        io_bufs * Rpad * C * 2 * 3  # xp, g, h2res in
        + io_bufs * Rpad * C * 2    # dx out
        + 2 * Rpad * C * 2          # dh3/dv and dh1 scratch volumes (dot dtype)
        + rt * 27 * C * 2           # im2col scratch
        + 2 * 27 * C * C * 2        # w1t, w2t resident
        + Rpad * 4
        + 16 * C * 4
    )


def _stack_bytes(T, H, W, C, n_gn_passes):
    """Scoped-vmem STACK estimate for the unrolled loops: every tile
    iteration's live f32 temporaries stay allocated.  Calibrated on the
    measured 23.2 MB forward at (6,16,16,128): ~12 live (ET,C) f32 values
    per elementwise tile plus ~3 live conv windows per row tile."""
    plan = _plan(T, H, W, C)
    if plan is None:
        return None
    rt, n_rows, off_center, off_pad, Rpad, L, R, offs = plan
    n_et = Rpad // ET
    per_pass = 4 * n_et * ET * C * 4          # ~4 live f32 tiles per loop pass
    conv = 3 * n_rows * (rt + off_pad) * C * 2
    return n_gn_passes * per_pass + conv


def supports_shape(T: int, H: int, W: int, C: int, OC: int,
                   groups: int, B: int = 1) -> bool:
    from .dispatch import VMEM_BUDGET_BYTES

    if OC != C or C % 128 or C % groups:
        return False
    b = _fwd_bytes(T, H, W, C, B)
    s = _stack_bytes(T, H, W, C, n_gn_passes=3)  # 2 gn-stats + 2 act loops
    return (
        b is not None
        and b <= VMEM_BUDGET_BYTES
        and b + s <= _STACK_HEADROOM * KERNEL_VMEM_LIMIT
    )


def supports_bwd_shape(T: int, H: int, W: int, C: int,
                       groups: int, B: int = 1) -> bool:
    from .dispatch import VMEM_BUDGET_BYTES

    if C % 128 or C % groups:
        return False
    b = _bwd_bytes(T, H, W, C, B)
    s = _stack_bytes(T, H, W, C, n_gn_passes=5)  # stats + 2 sum + dv + dx
    return (
        b is not None
        and b <= VMEM_BUDGET_BYTES
        and b + s <= _STACK_HEADROOM * KERNEL_VMEM_LIMIT
    )


def _row_mask(T, H, W, Rpad) -> np.ndarray:
    """(Rpad, 1) f32: 1 on natural rows holding a valid (interior) token."""
    Tp, Hp, Wp = T + 2, H + 2, W + 2
    s = np.arange(Rpad)
    w = s % Wp
    h = (s // Wp) % Hp
    t = s // (Hp * Wp)
    valid = (
        (s < Tp * Hp * Wp)
        & (t >= 1) & (t <= T) & (h >= 1) & (h <= H) & (w >= 1) & (w <= W)
    )
    return valid.astype(np.float32)[:, None]


def _group_matrix(C: int, groups: int) -> np.ndarray:
    gp = max(groups, 128)
    m = np.zeros((C, gp), np.float32)
    m[np.arange(C), np.arange(C) // (C // groups)] = 1.0
    return m


# ---------------------------------------------------------------- kernels


def _gn_stats(src_row, emb_row, mask_ref, gmat_ref, cstat, n_et, count,
              eps, mean_row, inv_row):
    """Two-pass masked GroupNorm stats of (src + emb) into cstat rows
    ``mean_row`` (per-channel group mean) and ``inv_row`` (rsqrt(var+eps)).
    ``src_row(j)`` returns the f32 (ET, C) tile j; emb_row is (1, C) f32 or
    None.  cstat rows 0/1 are scratch accumulators."""
    for j in range(n_et):
        x = src_row(j)
        m = mask_ref[pl.ds(j * ET, ET), :]
        if emb_row is not None:
            x = x + emb_row
        cs = jnp.sum(x * m, axis=0, keepdims=True)
        if j == 0:
            cstat[0:1] = cs
        else:
            cstat[0:1] = cstat[0:1] + cs
    gm = gmat_ref[...]
    mean_g = jax.lax.dot(cstat[0:1], gm,
                         preferred_element_type=jnp.float32) / count
    cstat[mean_row:mean_row + 1] = jax.lax.dot_general(
        mean_g, gm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    for j in range(n_et):
        x = src_row(j)
        m = mask_ref[pl.ds(j * ET, ET), :]
        if emb_row is not None:
            x = x + emb_row
        xs = (x - cstat[mean_row:mean_row + 1]) * m
        ss = jnp.sum(xs * xs, axis=0, keepdims=True)
        if j == 0:
            cstat[1:2] = ss
        else:
            cstat[1:2] = cstat[1:2] + ss
    var_g = jax.lax.dot(cstat[1:2], gm,
                        preferred_element_type=jnp.float32) / count
    inv_g = jax.lax.rsqrt(var_g + eps)
    cstat[inv_row:inv_row + 1] = jax.lax.dot_general(
        inv_g, gm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _conv_loop(src_ref, w_ref, xcat_ref, write_fn, *, offs, rt, n_rows,
               off_pad, dot_dtype):
    """Shifted-row im2col GEMM over corner row tiles (pallas_conv3d design);
    ``write_fn(i, acc_f32)`` consumes each (rt, C) f32 output tile."""
    nd = len(src_ref.shape)
    C = src_ref.shape[-1]
    for i in range(n_rows):
        if nd == 3:
            win = src_ref[0, pl.ds(i * rt, rt + off_pad), :]
        else:
            win = src_ref[pl.ds(i * rt, rt + off_pad), :]
        win = win.astype(dot_dtype)
        for tap, off in enumerate(offs):
            xcat_ref[:, tap * C:(tap + 1) * C] = win[off:off + rt]
        acc = jax.lax.dot(xcat_ref[...], w_ref[...],
                          preferred_element_type=jnp.float32)
        write_fn(i, acc)


def _resblock_fwd_kernel(xp_ref, emb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                         g1s_ref, g1b_ref, g2s_ref, g2b_ref,
                         gmat_ref, mask_ref,
                         out_ref, h2_ref,
                         h_scr, xcat_ref, cstat,
                         *, groups, eps, count, rt, n_rows, n_et,
                         off_center, off_pad, offs, dot_dtype):
    emb = emb_ref[0].astype(jnp.float32)           # (1, C)

    def xp_row(j):
        return xp_ref[0, pl.ds(j * ET, ET), :].astype(jnp.float32)

    # GN1 -> h1 = mask * silu(gn1(x))
    _gn_stats(xp_row, None, mask_ref, gmat_ref, cstat, n_et, count, eps, 2, 3)
    for j in range(n_et):
        m = mask_ref[pl.ds(j * ET, ET), :]
        a = ((xp_row(j) - cstat[2:3]) * cstat[3:4]
             * g1s_ref[0].astype(jnp.float32) + g1b_ref[0].astype(jnp.float32))
        h_scr[pl.ds(j * ET, ET), :] = (jax.nn.silu(a) * m).astype(dot_dtype)

    # conv1 (+b1, masked) -> h2 residual output (natural rows; ring zeroed)
    for j in range(n_et):
        h2_ref[0, pl.ds(j * ET, ET), :] = jnp.zeros((ET, h2_ref.shape[2]),
                                                    h2_ref.dtype)

    def write_h2(i, acc):
        m = mask_ref[pl.ds(i * rt + off_center, rt), :]
        h2_ref[0, pl.ds(i * rt + off_center, rt), :] = (
            (acc + b1_ref[0].astype(jnp.float32)) * m
        ).astype(h2_ref.dtype)

    _conv_loop(h_scr, w1_ref, xcat_ref, write_h2, offs=offs, rt=rt,
               n_rows=n_rows, off_pad=off_pad, dot_dtype=dot_dtype)

    def h2_row(j):
        return h2_ref[0, pl.ds(j * ET, ET), :].astype(jnp.float32)

    # GN2 over (h2 + emb) -> h3 = mask * silu(gn2(.))
    _gn_stats(h2_row, emb, mask_ref, gmat_ref, cstat, n_et, count, eps, 2, 3)
    for j in range(n_et):
        m = mask_ref[pl.ds(j * ET, ET), :]
        a = ((h2_row(j) + emb - cstat[2:3]) * cstat[3:4]
             * g2s_ref[0].astype(jnp.float32) + g2b_ref[0].astype(jnp.float32))
        h_scr[pl.ds(j * ET, ET), :] = (jax.nn.silu(a) * m).astype(dot_dtype)

    # conv2 (+b2) + identity skip -> out (natural rows; ring left stale,
    # cropped by the caller)
    def write_out(i, acc):
        xs = xp_ref[0, pl.ds(i * rt + off_center, rt), :].astype(jnp.float32)
        out_ref[0, pl.ds(i * rt + off_center, rt), :] = (
            acc + b2_ref[0].astype(jnp.float32) + xs
        ).astype(out_ref.dtype)

    _conv_loop(h_scr, w2_ref, xcat_ref, write_out, offs=offs, rt=rt,
               n_rows=n_rows, off_pad=off_pad, dot_dtype=dot_dtype)


def _silu_grad(a):
    s = jax.nn.sigmoid(a)
    return s * (1.0 + a * (1.0 - s))


def _resblock_bwd_kernel(xp_ref, emb_ref, g_ref, h2_ref, w1t_ref, w2t_ref,
                         g1s_ref, g1b_ref, g2s_ref, g2b_ref,
                         gmat_ref, mask_ref,
                         dx_ref, demb_ref,
                         v1_scr, v2_scr, xcat_ref, cstat,
                         *, groups, eps, count, rt, n_rows, n_et,
                         off_center, off_pad, offs, dot_dtype):
    """dx, demb of the fused resblock.  cstat rows: 0/1 accumulators,
    2/3 gn1 mean/inv, 4/5 gn2 mean/inv, 6/7 expanded group sums, 8 demb."""
    emb = emb_ref[0].astype(jnp.float32)
    gm = gmat_ref[...]
    g1s = g1s_ref[0].astype(jnp.float32)
    g1b = g1b_ref[0].astype(jnp.float32)
    g2s = g2s_ref[0].astype(jnp.float32)
    g2b = g2b_ref[0].astype(jnp.float32)

    def xp_row(j):
        return xp_ref[0, pl.ds(j * ET, ET), :].astype(jnp.float32)

    def h2_row(j):
        return h2_ref[0, pl.ds(j * ET, ET), :].astype(jnp.float32)

    _gn_stats(xp_row, None, mask_ref, gmat_ref, cstat, n_et, count, eps, 2, 3)
    _gn_stats(h2_row, emb, mask_ref, gmat_ref, cstat, n_et, count, eps, 4, 5)

    # dh3 = conv2^T(g) into v1_scr (natural rows, ring zeroed)
    for j in range(n_et):
        v1_scr[pl.ds(j * ET, ET), :] = jnp.zeros((ET, v1_scr.shape[1]),
                                                 v1_scr.dtype)

    def write_dh3(i, acc):
        v1_scr[pl.ds(i * rt + off_center, rt), :] = acc.astype(v1_scr.dtype)

    _conv_loop(g_ref, w2t_ref, xcat_ref, write_dh3, offs=offs, rt=rt,
               n_rows=n_rows, off_pad=off_pad, dot_dtype=dot_dtype)

    def gn2_terms(j):
        m = mask_ref[pl.ds(j * ET, ET), :]
        v = h2_row(j) + emb
        xhat = (v - cstat[4:5]) * cstat[5:6]
        a2 = xhat * g2s + g2b
        da2 = v1_scr[pl.ds(j * ET, ET), :] * _silu_grad(a2) * m
        u = da2 * g2s
        return u, xhat, m

    # group sums S1 = sum(u), S2 = sum(u * xhat) over valid rows
    for j in range(n_et):
        u, xhat, m = gn2_terms(j)
        cs1 = jnp.sum(u, axis=0, keepdims=True)
        cs2 = jnp.sum(u * xhat, axis=0, keepdims=True)
        if j == 0:
            cstat[0:1] = cs1
            cstat[1:2] = cs2
        else:
            cstat[0:1] = cstat[0:1] + cs1
            cstat[1:2] = cstat[1:2] + cs2
    cstat[6:7] = jax.lax.dot_general(
        jax.lax.dot(cstat[0:1], gm, preferred_element_type=jnp.float32),
        gm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    cstat[7:8] = jax.lax.dot_general(
        jax.lax.dot(cstat[1:2], gm, preferred_element_type=jnp.float32),
        gm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    # dv = inv2 * (u - (S1 + xhat*S2)/count) * mask  (overwrites v1_scr);
    # demb = sum(dv) over valid rows
    for j in range(n_et):
        u, xhat, m = gn2_terms(j)
        dv = cstat[5:6] * (u - (cstat[6:7] + xhat * cstat[7:8]) / count) * m
        v1_scr[pl.ds(j * ET, ET), :] = dv.astype(v1_scr.dtype)
        ds = jnp.sum(dv, axis=0, keepdims=True)
        if j == 0:
            cstat[8:9] = ds
        else:
            cstat[8:9] = cstat[8:9] + ds
    demb_ref[0] = cstat[8:9].astype(demb_ref.dtype)

    # dh1 = conv1^T(dv) into v2_scr (natural rows, ring zeroed)
    for j in range(n_et):
        v2_scr[pl.ds(j * ET, ET), :] = jnp.zeros((ET, v2_scr.shape[1]),
                                                 v2_scr.dtype)

    def write_dh1(i, acc):
        v2_scr[pl.ds(i * rt + off_center, rt), :] = acc.astype(v2_scr.dtype)

    _conv_loop(v1_scr, w1t_ref, xcat_ref, write_dh1, offs=offs, rt=rt,
               n_rows=n_rows, off_pad=off_pad, dot_dtype=dot_dtype)

    def gn1_terms(j):
        m = mask_ref[pl.ds(j * ET, ET), :]
        xhat = (xp_row(j) - cstat[2:3]) * cstat[3:4]
        a1 = xhat * g1s + g1b
        da1 = v2_scr[pl.ds(j * ET, ET), :] * _silu_grad(a1) * m
        u = da1 * g1s
        return u, xhat, m

    for j in range(n_et):
        u, xhat, m = gn1_terms(j)
        cs1 = jnp.sum(u, axis=0, keepdims=True)
        cs2 = jnp.sum(u * xhat, axis=0, keepdims=True)
        if j == 0:
            cstat[0:1] = cs1
            cstat[1:2] = cs2
        else:
            cstat[0:1] = cstat[0:1] + cs1
            cstat[1:2] = cstat[1:2] + cs2
    cstat[6:7] = jax.lax.dot_general(
        jax.lax.dot(cstat[0:1], gm, preferred_element_type=jnp.float32),
        gm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    cstat[7:8] = jax.lax.dot_general(
        jax.lax.dot(cstat[1:2], gm, preferred_element_type=jnp.float32),
        gm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)

    # dx = gn1 input grad + g (identity skip)
    for j in range(n_et):
        u, xhat, m = gn1_terms(j)
        dxg = cstat[3:4] * (u - (cstat[6:7] + xhat * cstat[7:8]) / count) * m
        gj = g_ref[0, pl.ds(j * ET, ET), :].astype(jnp.float32)
        dx_ref[0, pl.ds(j * ET, ET), :] = (dxg + gj).astype(dx_ref.dtype)


# ------------------------------------------------------------- wrappers


def _natural_rows(x5, Rpad):
    """(B,T,H,W,C) -> zero-padded natural rows (B, Rpad, C)."""
    B, T, H, W, C = x5.shape
    xp = jnp.pad(x5, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    xp = xp.reshape(B, (T + 2) * (H + 2) * (W + 2), C)
    return jnp.pad(xp, ((0, 0), (0, Rpad - xp.shape[1]), (0, 0)))


def _crop_rows(rows, T, H, W):
    """(B, Rpad, C) natural rows -> (B,T,H,W,C) interior."""
    B, Rpad, C = rows.shape
    Tp, Hp, Wp = T + 2, H + 2, W + 2
    vol = rows[:, :Tp * Hp * Wp].reshape(B, Tp, Hp, Wp, C)
    return vol[:, 1:T + 1, 1:H + 1, 1:W + 1, :]


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "mxu_dtype_name", "interpret"))
def fused_resblock(x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b,
                   groups=32, eps=1e-5, mxu_dtype_name="bfloat16",
                   interpret=False):
    """Fused resblock forward.  x (B,T,H,W,C); emb (B,C) (pass zeros for a
    no-embedding block); k1/k2 (3,3,3,C,C).  Returns (out, h2_residual) —
    callers other than the custom_vjp discard h2.  Gate with
    :func:`supports_shape`."""
    B, T, H, W, C = x.shape
    plan = _plan(T, H, W, C)
    assert plan is not None, "caller must gate with supports_shape()"
    rt, n_rows, off_center, off_pad, Rpad, L, R, offs = plan
    dot_dtype = jnp.dtype(mxu_dtype_name)
    n_et = Rpad // ET
    count = float(T * H * W * (C // groups))
    gp = max(groups, 128)
    gmat = jnp.asarray(_group_matrix(C, groups))
    mask = jnp.asarray(_row_mask(T, H, W, Rpad))
    xp = _natural_rows(x, Rpad)
    w1 = k1.reshape(27 * C, C).astype(dot_dtype)
    w2 = k2.reshape(27 * C, C).astype(dot_dtype)
    row = lambda b: (0, 0)  # noqa: E731
    sample_row = lambda b: (b, 0, 0)  # noqa: E731
    out, h2 = pl.pallas_call(
        functools.partial(
            _resblock_fwd_kernel, groups=groups, eps=eps, count=count, rt=rt,
            n_rows=n_rows, n_et=n_et, off_center=off_center, off_pad=off_pad,
            offs=offs, dot_dtype=dot_dtype),
        grid=(B,),
        name="fused_resblock",
        in_specs=[
            pl.BlockSpec((1, Rpad, C), sample_row),
            pl.BlockSpec((1, 1, C), sample_row),
            pl.BlockSpec((27 * C, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((27 * C, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((C, gp), row),
            pl.BlockSpec((Rpad, 1), row),
        ],
        out_specs=(
            pl.BlockSpec((1, Rpad, C), sample_row),
            pl.BlockSpec((1, Rpad, C), sample_row),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Rpad, C), x.dtype),
            jax.ShapeDtypeStruct((B, Rpad, C), dot_dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rpad, C), dot_dtype),
            pltpu.VMEM((rt, 27 * C), dot_dtype),
            pltpu.VMEM((16, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 27 * B * n_rows * rt * C * C,
            bytes_accessed=3 * B * Rpad * C * 2 + 2 * 27 * C * C * 2,
            transcendentals=4 * B * Rpad * C,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
        interpret=interpret,
    )(xp, emb.reshape(B, 1, C), w1, b1.reshape(1, C), w2, b2.reshape(1, C),
      g1s.reshape(1, C), g1b.reshape(1, C), g2s.reshape(1, C),
      g2b.reshape(1, C), gmat, mask)
    return _crop_rows(out, T, H, W), h2


@functools.partial(
    jax.jit, static_argnames=("groups", "eps", "mxu_dtype_name", "interpret"))
def _fused_resblock_bwd(x, emb, k1, k2, g1s, g1b, g2s, g2b, h2, g,
                        groups=32, eps=1e-5, mxu_dtype_name="bfloat16",
                        interpret=False):
    """(dx, demb) of the fused resblock via one Pallas call."""
    B, T, H, W, C = x.shape
    rt, n_rows, off_center, off_pad, Rpad, L, R, offs = _plan(T, H, W, C)
    dot_dtype = jnp.dtype(mxu_dtype_name)
    n_et = Rpad // ET
    count = float(T * H * W * (C // groups))
    gp = max(groups, 128)
    gmat = jnp.asarray(_group_matrix(C, groups))
    mask = jnp.asarray(_row_mask(T, H, W, Rpad))
    xp = _natural_rows(x, Rpad)
    gpad = _natural_rows(g, Rpad)
    # conv^T = SAME conv with flipped taps, in/out channels swapped
    w1t = k1[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3).reshape(27 * C, C)
    w2t = k2[::-1, ::-1, ::-1].transpose(0, 1, 2, 4, 3).reshape(27 * C, C)
    row = lambda b: (0, 0)  # noqa: E731
    sample_row = lambda b: (b, 0, 0)  # noqa: E731
    dxn, demb = pl.pallas_call(
        functools.partial(
            _resblock_bwd_kernel, groups=groups, eps=eps, count=count, rt=rt,
            n_rows=n_rows, n_et=n_et, off_center=off_center, off_pad=off_pad,
            offs=offs, dot_dtype=dot_dtype),
        grid=(B,),
        name="_fused_resblock_bwd",
        in_specs=[
            pl.BlockSpec((1, Rpad, C), sample_row),
            pl.BlockSpec((1, 1, C), sample_row),
            pl.BlockSpec((1, Rpad, C), sample_row),
            pl.BlockSpec((1, Rpad, C), sample_row),
            pl.BlockSpec((27 * C, C), row),
            pl.BlockSpec((27 * C, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((1, C), row),
            pl.BlockSpec((C, gp), row),
            pl.BlockSpec((Rpad, 1), row),
        ],
        out_specs=(
            pl.BlockSpec((1, Rpad, C), sample_row),
            pl.BlockSpec((1, 1, C), sample_row),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Rpad, C), x.dtype),
            jax.ShapeDtypeStruct((B, 1, C), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Rpad, C), dot_dtype),
            pltpu.VMEM((Rpad, C), dot_dtype),
            pltpu.VMEM((rt, 27 * C), dot_dtype),
            pltpu.VMEM((16, C), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * 27 * B * n_rows * rt * C * C,
            bytes_accessed=5 * B * Rpad * C * 2 + 2 * 27 * C * C * 2,
            transcendentals=8 * B * Rpad * C,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=KERNEL_VMEM_LIMIT),
        interpret=interpret,
    )(xp, emb.reshape(B, 1, C), gpad, h2,
      w1t.astype(dot_dtype), w2t.astype(dot_dtype),
      g1s.reshape(1, C), g1b.reshape(1, C), g2s.reshape(1, C),
      g2b.reshape(1, C), gmat, mask)
    return _crop_rows(dxn, T, H, W), demb.reshape(B, C).astype(emb.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def fused_resblock_diff(x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b,
                        groups=32, eps=1e-5, mxu_dtype_name="bfloat16",
                        interpret=False):
    """Differentiable fused resblock: forward = one Pallas kernel; dx/demb =
    one fused backward kernel (recomputing the norms from the saved conv1
    output); parameter grads via ``jax.vjp`` of the jnp reference — DCE'd
    under input-only differentiation (guidance)."""
    out, _ = fused_resblock(x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b,
                            groups=groups, eps=eps,
                            mxu_dtype_name=mxu_dtype_name, interpret=interpret)
    return out


def _diff_fwd(x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b,
              groups, eps, mxu_dtype_name, interpret):
    out, h2 = fused_resblock(x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b,
                             groups=groups, eps=eps,
                             mxu_dtype_name=mxu_dtype_name,
                             interpret=interpret)
    return out, (x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b, h2)


def _diff_bwd(groups, eps, mxu_dtype_name, interpret, res, g):
    x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b, h2 = res
    B, T, H, W, C = x.shape
    if supports_bwd_shape(T, H, W, C, groups, B=B):
        dx, demb = _fused_resblock_bwd(
            x, emb, k1, k2, g1s, g1b, g2s, g2b, h2, g,
            groups=groups, eps=eps, mxu_dtype_name=mxu_dtype_name,
            interpret=interpret)
    else:  # over VMEM budget (large B): XLA-recompute dx/demb
        _, vjp_x = jax.vjp(
            lambda xx, em: resblock_reference(
                xx, em, k1, b1, k2, b2, g1s, g1b, g2s, g2b,
                groups=groups, eps=eps), x, emb)
        dx, demb = vjp_x(g)
    # parameter grads: XLA recompute (deleted by DCE under guidance)
    _, vjp_p = jax.vjp(
        lambda *p: resblock_reference(x, emb, *p, groups=groups, eps=eps),
        k1, b1, k2, b2, g1s, g1b, g2s, g2b)
    dk1, db1, dk2, db2, dg1s, dg1b, dg2s, dg2b = vjp_p(g)
    return (dx, demb, dk1, db1, dk2, db2, dg1s, dg1b, dg2s, dg2b)


fused_resblock_diff.defvjp(_diff_fwd, _diff_bwd)


def _groupnorm_ref(x, scale, bias, groups, eps):
    B, T, H, W, C = x.shape
    g = x.reshape(B, T, H, W, groups, C // groups)
    mean = g.mean(axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.square(g - mean).mean(axis=(1, 2, 3, 5), keepdims=True)
    y = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return y * scale + bias


def resblock_reference(x, emb, k1, b1, k2, b2, g1s, g1b, g2s, g2b,
                       groups=32, eps=1e-5):
    """Pure-jnp f32 reference of the non-scale-shift TimeEmbedResBlock body
    (identity skip), for tests and the param-grad recompute."""
    xf = x.astype(jnp.float32)
    h = jax.nn.silu(_groupnorm_ref(xf, g1s, g1b, groups, eps))
    h = conv3x3x3_reference(h, k1.astype(jnp.float32), b1.astype(jnp.float32))
    v = h + emb.astype(jnp.float32)[:, None, None, None, :]
    h = jax.nn.silu(_groupnorm_ref(v, g2s, g2b, groups, eps))
    h = conv3x3x3_reference(h, k2.astype(jnp.float32), b2.astype(jnp.float32))
    return (xf + h).astype(x.dtype)
