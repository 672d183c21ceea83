"""Round-4 probe: isolate XLA conv2d forward vs backward efficiency at the
VAE decoder's hot shapes — which of dgrad/wgrad loses the 38%-MFU backward
(probe73), and how much headroom a custom kernel would have for round 5.

Protocol (CLAUDE.md): scanned K-iteration chains so device time dominates
dispatch, chained carries, scalar fetch, warmup case first, bf16 and f32
variants (probe75 showed storage dtype matters little for compute-bound
convs; this separates the emitters cleanly).

MEASURED (one v5e, 2026-08-19; first run had a TF/s math bug — times were
always real, rates below are corrected):
  B32 128x128 128->128 bf16: fwd 1.388 ms (111 TF/s, 57% peak),
    dgrad 1.383, wgrad 1.371 — fwd == dgrad == wgrad.
  B32 128x128 128->128 f32:  fwd 1.900 ms (81 TF/s, 41%), dgrad 1.863,
    wgrad 1.807 — explicit bf16 is 1.37x at this shape.
  B32 64x64 256->256 bf16:   1.050 / 1.051 / 1.002 ms (147-154 TF/s,
    75-78% peak).
  B32 32x32 512->512 bf16:   0.945 / 0.954 / 0.988 ms (156-164 TF/s,
    79-83% peak).
Conclusion: XLA's conv emitter is near-roofline at low-res/high-channel
shapes; the loss is concentrated at the HIGH-RES LOW-CHANNEL (128x128,
128ch) decoder shapes (~57% bf16 / 41% f32), uniformly across
fwd/dgrad/wgrad — not a backward-specific pathology.  probe73's "38% bwd
MFU" aggregate = f32 storage (probe75's +4.6% fixes part) + this shape
effect.  A round-5 custom conv kernel should target the 128x128 stage
specifically (~1.7x headroom there, ~0 elsewhere); arithmetic intensity
says it is NOT HBM-bound (268 MB / 1.37 ms = 196 GB/s << 819), so the
win would come from better spatial tiling of the 3x3 halo.
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

K = 200


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def timed(tag, fn, args, flops_per_iter):
    f = jax.jit(fn)
    out = f(*args)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]))  # warm + fetch
    t0 = time.perf_counter()
    out = f(*args)
    s = float(np.asarray(jax.tree_util.tree_leaves(out)[0]))
    dt = (time.perf_counter() - t0) / K
    tf = flops_per_iter / dt / 1e12
    print(f"{tag:34s}: {dt*1e3:7.3f} ms/iter  {tf:6.1f} TF/s"
          f"  ({100*tf/197:4.1f}% bf16 peak)  [{s:.3e}]", flush=True)


def run_shape(B, H, Cin, Cout, dtype, warm=False):
    dt = jnp.dtype(dtype)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(B, H, H, Cin), dt) * 0.1
    w = jnp.asarray(rs.rand(3, 3, Cin, Cout), dt) * 0.1
    g = jnp.asarray(rs.rand(B, H, H, Cout), dt) * 0.1
    fl = 2 * B * H * H * Cin * Cout * 9  # per scan iteration
    tag = f"B{B} {H}x{H} {Cin}->{Cout} {dtype}"

    def fwd_chain(x, w):
        def body(c, _):
            y = conv(c, w)
            # renorm so the carry doesn't blow up; cost is negligible
            return y[..., :Cin] * 0.01, ()
        c, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(c)

    def dgrad_chain(g, w):
        def body(c, _):
            dx = jax.vjp(lambda xx: conv(xx, w),
                         jnp.zeros((B, H, H, Cin), dt))[1](c)[0]
            return dx[..., :Cout] * 0.01 if Cout <= Cin else jnp.pad(
                dx, ((0, 0),) * 3 + ((0, Cout - Cin),)), ()
        c, _ = jax.lax.scan(body, g, None, length=K)
        return jnp.sum(c)

    def wgrad_chain(g, x):
        def body(c, _):
            dw = jax.vjp(lambda ww: conv(x, ww),
                         jnp.zeros((3, 3, Cin, Cout), dt))[1](c)[0]
            return c * 0.999 + jnp.sum(dw) * 1e-12, ()
        c, _ = jax.lax.scan(body, g, None, length=K)
        return jnp.sum(c)

    if warm:
        timed(tag + " warmup", fwd_chain, (x, w), fl)
    timed(tag + " fwd", fwd_chain, (x, w), fl)
    timed(tag + " dgrad", dgrad_chain, (g, w), fl)
    timed(tag + " wgrad", wgrad_chain, (g, x), fl)


# decoder hot shapes at B=32 (probe73): up_blocks at 128x128x128,
# 64x64x256, 32x32x512; bf16 and f32 at the hottest
run_shape(32, 128, 128, 128, "bfloat16", warm=True)
run_shape(32, 128, 128, 128, "float32")
run_shape(32, 64, 256, 256, "bfloat16")
run_shape(32, 32, 512, 512, "bfloat16")
print("probe76 done", flush=True)
