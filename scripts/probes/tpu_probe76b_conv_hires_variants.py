"""Round-4 probe: XLA-level rewrites of the 57%-peak 128x128x128ch conv
(probe76).  Variants, all mathematically the same 3x3 'same' conv:

  a) baseline      : one 3x3 NHWC conv
  b) rowdec        : three accumulated 1x3 convs on row-shifted input
                     (the t2d trick one dimension down)
  c) coldec        : three accumulated 3x1 convs on col-shifted input
  d) nchw          : NCHW/OIHW dimension numbers
  e) b2x           : H folded into batch pairs? (kept out — overlap halo
                     makes it a different op; not attempted)

K=500 scanned chain, chained carry, scalar fetch, warmup case first.

MEASURED (one v5e, 2026-08-19): baseline 1.270 ms (121.8 TF/s, 61.8% bf16
peak — a touch better than probe76's K=200 reading of 57%), rowdec 2.063,
coldec 2.054 (38%: the decompositions HURT — XLA's 1x3 emitters are worse
than its 3x3 at this shape), nchw 1.270 (bit-identical rate: layout is
normalized before the emitter).  Conclusion: no XLA-level rewrite recovers
the 128x128x128ch loss; the lever is a Pallas halo-tiled conv kernel
(probe77).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

B, H, C = 32, 128, 128
K = 500
FL = 2 * B * H * H * C * C * 9


def conv_nhwc(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_rowdec(x, w):
    # w: (3,3,C,C).  y = sum_r conv1x3(shift_rows(x, r-1), w[r])
    h = x.shape[1]
    outs = 0
    for r in range(3):
        xr = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))[:, r:r + h]
        outs = outs + jax.lax.conv_general_dilated(
            xr, w[r:r + 1], (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return outs


def conv_coldec(x, w):
    w_ = x.shape[2]
    outs = 0
    for c in range(3):
        xc = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))[:, :, c:c + w_]
        outs = outs + jax.lax.conv_general_dilated(
            xc, w[:, c:c + 1], (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return outs


def conv_nchw(x, w):
    # x arrives NHWC; transpose once outside the scan is unfair — keep the
    # transpose INSIDE so the variant pays its true cost.
    xt = jnp.transpose(x, (0, 3, 1, 2))
    wt = jnp.transpose(w, (3, 2, 0, 1))
    y = jax.lax.conv_general_dilated(
        xt, wt, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return jnp.transpose(y, (0, 2, 3, 1))


def timed(tag, conv_fn, dtype="bfloat16"):
    dt = jnp.dtype(dtype)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, H, H, C), dt) * 0.1
    w = jnp.asarray(rs.rand(3, 3, C, C), dt) * 0.1

    def chain(x, w):
        def body(c, _):
            return conv_fn(c, w) * 0.01, ()
        c, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(c)

    f = jax.jit(chain)
    _ = float(np.asarray(f(x, w)))
    t0 = time.perf_counter()
    s = float(np.asarray(f(x, w)))
    per = (time.perf_counter() - t0) / K
    print(f"{tag:10s}: {per*1e3:7.3f} ms/conv  {FL/per/1e12:6.1f} TF/s"
          f"  ({100*FL/per/1e12/197:4.1f}% bf16 peak)  [{s:.1e}]",
          flush=True)


# equivalence check on CPU-sized slice first (values, not just rates)
xs = jnp.asarray(np.random.RandomState(1).rand(2, 16, 16, C), jnp.float32)
ws = jnp.asarray(np.random.RandomState(2).rand(3, 3, C, C), jnp.float32)
ref = conv_nhwc(xs, ws)
for nm, fn in (("rowdec", conv_rowdec), ("coldec", conv_coldec),
               ("nchw", conv_nchw)):
    d = float(jnp.max(jnp.abs(fn(xs[:, :, :, :], ws) - ref)))

    print(f"equiv {nm}: max|diff| {d:.2e}", flush=True)

timed("warmup", conv_nhwc)
timed("baseline", conv_nhwc)
timed("rowdec", conv_rowdec)
timed("coldec", conv_coldec)
timed("nchw", conv_nchw)
print("probe76b done", flush=True)
