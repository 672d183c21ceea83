"""Round-4 probe: Pallas halo-tiled 3x3 conv2d candidates for the VAE's
high-res low-channel stage (B=32, 128x128, 128->128ch), where XLA reads
only 57-62% of bf16 peak (probe76/76b) and no XLA-level rewrite helps.

Design (shared by all variants): grid (B, H/bh).  Input is the RAW
(B,H,W,C) array — no XLA pad/crop glue at all.  Each grid step sees its
(bh, W, C) row-tile plus two 1-row halo specs (the same array passed with
clamped row index maps; boundary rows are zeroed in-kernel), assembles a
flattened zero-padded window in VMEM scratch `xrows` ((bh+2)*Wp rows of C
lanes, image row k at offset k*Wp+1), and computes output pixel
(h, w) = sum_taps xrows[h*Wp + w + dh*Wp + dw] @ W[dh,dw].  Valid rows are
written straight into the (1, bh, W, OC) output block — bh static slices.

Variants:
  b1a : per-tap accumulated dots (9 x (bh*Wp, C)@(C, OC)), Wp = W+8 so the
        dh offsets stay 8-aligned (dw 1/2 still unaligned).
  b1u : same with Wp = W+2 (minimal 1.6% row waste, all offsets unaligned)
        — measures Mosaic's unaligned-slice relayout cost vs the waste.
  b2  : im2col scratch (bh*Wp, 9C) + ONE big-K GEMM (the conv3d recipe) —
        measures whether VMEM->VMEM tap copies beat per-tap dot overhead.
bh in {16, 32}.

Protocol: K=500 scanned chain, chained carry (C==OC), scalar fetch,
warmup case first, weights as jit args.  Correctness: jitted max|diff|
vs lax conv at the full shape (bf16, expect ~1e-2 abs at |x|~1).

MEASURED (2026-08-19, one v5e via relay, K=500 scanned chain):
  equiv: b1a/b1u bit-identical to lax conv; b2 (im2col) 7.8e-3 abs
         (tap-copy rounding at bf16) — all fine.
    warmup-xla  :   1.275 ms/conv   121.2 TF/s  (61.5% bf16 peak)
    xla         :   1.277 ms/conv   121.1 TF/s  (61.5% bf16 peak)
    b1a bh=16   :   1.399 ms/conv   110.5 TF/s  (56.1%)
    b1a bh=32   :   1.387 ms/conv   111.5 TF/s  (56.6%)
    b1u bh=16   :   1.400 ms/conv   110.4 TF/s  (56.1%)
    b1u bh=32   :   1.376 ms/conv   112.4 TF/s  (57.0%)
    b2  bh=16   :   1.506 ms/conv   102.7 TF/s  (52.1%)
    b2  bh=32   :   1.479 ms/conv   104.5 TF/s  (53.1%)
  VERDICT: every Pallas candidate LOSES to XLA's native conv emitter
  (best 57.0% vs 61.5%).  Tap alignment is irrelevant (b1a==b1u: Mosaic's
  unaligned-slice relayout is free here), bh barely matters, and im2col
  is strictly worse (VMEM->VMEM tap copies cost more than per-tap dot
  setup).  The uniform ~0.11 ms/conv gap vs XLA is the 9 per-tap f32
  accumulator adds riding the VPU between MXU dots — XLA's conv emitter
  keeps the accumulation inside the MXU pipeline, which Mosaic-level
  code cannot express.  Together with probe76b (no XLA-level rewrite
  helps either), this CLOSES the VAE high-res conv thread: 61.5% of
  bf16 peak on the 128x128x128ch shape is the hardware/compiler
  ceiling; no custom-kernel lever remains.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

B, H, C = 32, 128, 128
W, OC = H, C
K = 500
FL = 2 * B * H * W * C * OC * 9


def conv_ref(x, w, b):
    return lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


def _kernel(cur_ref, top_ref, bot_ref, w_ref, b_ref, o_ref, xrows_ref,
            *maybe_xcat, bh, Wp, n_h, im2col):
    b = pl.program_id(0)
    i = pl.program_id(1)
    Rg = bh * Wp
    offs = [dh * Wp + dw for dh in range(3) for dw in range(3)]

    @pl.when(jnp.logical_and(b == 0, i == 0))
    def _():
        xrows_ref[...] = jnp.zeros(xrows_ref.shape, xrows_ref.dtype)

    top = jnp.where(i > 0, top_ref[0, 0], 0).astype(xrows_ref.dtype)
    bot = jnp.where(i < n_h - 1, bot_ref[0, 0], 0).astype(xrows_ref.dtype)
    xrows_ref[1:1 + W, :] = top
    for k in range(bh):
        o = (k + 1) * Wp + 1
        xrows_ref[o:o + W, :] = cur_ref[0, k]
    o = (bh + 1) * Wp + 1
    xrows_ref[o:o + W, :] = bot

    if im2col:
        xcat_ref = maybe_xcat[0]
        for t, off in enumerate(offs):
            xcat_ref[:, t * C:(t + 1) * C] = xrows_ref[off:off + Rg, :]
        acc = lax.dot(xcat_ref[...], w_ref[...],
                      preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((Rg, OC), jnp.float32)
        for t, off in enumerate(offs):
            acc = acc + lax.dot(xrows_ref[off:off + Rg, :],
                                w_ref[t * C:(t + 1) * C, :],
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    for h in range(bh):
        o_ref[0, h] = acc[h * Wp:h * Wp + W].astype(o_ref.dtype)


def make_conv(bh, wpad, im2col):
    Wp = W + wpad
    n_h = H // bh
    size = (bh + 2) * Wp + 8

    def conv(x, w, b):
        w9 = w.reshape(9 * C, OC).astype(jnp.bfloat16)
        scratch = [pltpu.VMEM((size, C), jnp.bfloat16)]
        if im2col:
            scratch.append(pltpu.VMEM((bh * Wp, 9 * C), jnp.bfloat16))
        return pl.pallas_call(
            functools.partial(_kernel, bh=bh, Wp=Wp, n_h=n_h, im2col=im2col),
            grid=(B, n_h),
            in_specs=[
                pl.BlockSpec((1, bh, W, C), lambda b, i: (b, i, 0, 0)),
                pl.BlockSpec((1, 1, W, C),
                             lambda b, i: (b, jnp.maximum(i * bh - 1, 0),
                                           0, 0)),
                pl.BlockSpec((1, 1, W, C),
                             lambda b, i: (b, jnp.minimum(i * bh + bh, H - 1),
                                           0, 0)),
                pl.BlockSpec((9 * C, OC), lambda b, i: (0, 0)),
                pl.BlockSpec((1, OC), lambda b, i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bh, W, OC), lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, OC), x.dtype),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=48 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * 9 * B * H * W * C * OC,
                bytes_accessed=(B * H * W * C * 2 + 9 * C * OC) * 2
                + B * H * W * OC * 2,
                transcendentals=0,
            ),
            name=f"conv2d_{'b2' if im2col else 'b1'}_bh{bh}_wp{wpad}",
        )(x, x, x, w9, b.reshape(1, OC))

    return conv


def timed(tag, conv_fn):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, H, W, C), jnp.bfloat16) * 0.1
    w = jnp.asarray(rs.rand(3, 3, C, OC), jnp.bfloat16) * 0.1
    bb = jnp.zeros((OC,), jnp.bfloat16)

    def chain(x, w, bb):
        def body(c, _):
            return conv_fn(c, w, bb) * 0.01, ()
        c, _ = lax.scan(body, x, None, length=K)
        return jnp.sum(c)

    f = jax.jit(chain)
    _ = float(np.asarray(f(x, w, bb)))
    t0 = time.perf_counter()
    s = float(np.asarray(f(x, w, bb)))
    per = (time.perf_counter() - t0) / K
    print(f"{tag:12s}: {per*1e3:7.3f} ms/conv  {FL/per/1e12:6.1f} TF/s"
          f"  ({100*FL/per/1e12/197:4.1f}% bf16 peak)  [{s:.1e}]",
          flush=True)


# correctness at the full shape (jitted; bf16 tap-order tolerance)
rs = np.random.RandomState(1)
xc = jnp.asarray(rs.rand(B, H, W, C), jnp.bfloat16) * 0.5
wc = jnp.asarray(rs.randn(3, 3, C, OC), jnp.bfloat16) * 0.05
bc = jnp.asarray(rs.randn(OC), jnp.bfloat16) * 0.1
ref = jax.jit(conv_ref)(xc, wc, bc)
for tag, fn in (("b1a16", make_conv(16, 8, False)),
                ("b1u16", make_conv(16, 2, False)),
                ("b216", make_conv(16, 8, True))):
    d = float(jnp.max(jnp.abs(jax.jit(fn)(xc, wc, bc) - ref)))
    m = float(jnp.max(jnp.abs(ref)))
    print(f"equiv {tag}: max|diff| {d:.2e}  (|y|max {m:.1f})", flush=True)

timed("warmup-xla", conv_ref)
timed("xla", conv_ref)
timed("b1a bh=16", make_conv(16, 8, False))
timed("b1a bh=32", make_conv(32, 8, False))
timed("b1u bh=16", make_conv(16, 2, False))
timed("b1u bh=32", make_conv(32, 2, False))
timed("b2  bh=16", make_conv(16, 8, True))
timed("b2  bh=32", make_conv(32, 8, True))
print("probe77 done", flush=True)
