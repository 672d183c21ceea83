"""Round-3 probe L: XLA im2col lowering for conv3x3x3 at B=1.

probe51: at B=1 the MXU only reaches ~20-25 TF/s on small-K dots, but the
one-big-GEMM im2col shape (3328,6912)@(6912,256) runs at 100+ TF/s.  So
lower the conv as: pad -> 27 shifted slices -> lane-concat (B,THW,27C) ->
single GEMM with the (27C,OC) reshaped kernel.  The im2col tensor
materializes in HBM (46 MB bf16 at stage 0) — the bet is one HBM roundtrip
beats three MXU-starved 2-D convs.

Measures err vs lax + time vs t2d at the B=1 and B=8 stages.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from prediff_tpu.utils.platform import respect_jax_platforms_env
respect_jax_platforms_env()
import jax
import jax.numpy as jnp
from jax import lax

from prediff_tpu.models.layers import Conv3x3x3
from prediff_tpu.ops.pallas_conv3d import conv3x3x3_reference

print("backend:", jax.default_backend(), flush=True)
K = 50


def im2col_conv(x, kernel, bias, dot_dtype=jnp.bfloat16):
    B, T, H, W, C = x.shape
    OC = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))).astype(dot_dtype)
    cols = jnp.concatenate(
        [xp[:, dt:dt + T, dh:dh + H, dw:dw + W, :]
         for dt in range(3) for dh in range(3) for dw in range(3)],
        axis=-1,
    )  # (B,T,H,W,27C), tap-major lanes
    w = kernel.reshape(27 * C, OC).astype(dot_dtype)
    out = jax.lax.dot(
        cols.reshape(B * T * H * W, 27 * C), w,
        preferred_element_type=jnp.float32,
    )
    return (out + bias.astype(jnp.float32)).reshape(B, T, H, W, OC).astype(x.dtype)


def timeit(tag, fn, *args, flops=None):
    jf = jax.jit(fn)
    _ = float(np.asarray(jf(*args)))
    t0 = time.perf_counter()
    _ = float(np.asarray(jf(*args)))
    dt = (time.perf_counter() - t0) / K
    extra = f"  {flops/dt/1e12:7.1f} TF/s" if flops else ""
    print(f"{tag:36s}: {dt*1e6:9.1f} us/iter{extra}", flush=True)
    return dt


rs = np.random.RandomState(0)
SHAPES = [("stage0", (1, 13, 16, 16, 256)), ("stage1", (1, 13, 8, 8, 512)),
          ("align s1", (1, 6, 16, 16, 128)),
          ("stage0 B8", (8, 13, 16, 16, 256))]
for sname, (B, T, H, W, C) in SHAPES:
    x = jnp.asarray(rs.rand(B, T, H, W, C).astype(np.float32)) - 0.5
    kern = jnp.asarray(rs.rand(3, 3, 3, C, C).astype(np.float32)) * 0.05
    bias = jnp.asarray(rs.rand(C).astype(np.float32))
    ref = conv3x3x3_reference(x, kern, bias)
    got = im2col_conv(x, kern, bias)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print(f"{sname}: rel err vs lax: {err:.2e}", flush=True)

    CONV_FLOPS = 2 * 27 * B * T * H * W * C * C

    def chain_i2c(x, kern, bias):
        def step(c, _):
            return im2col_conv(c, kern, bias) * 1e-2, None
        xf, _ = lax.scan(step, x, None, length=K)
        return jnp.sum(xf)

    conv = Conv3x3x3(features=C, impl="t2d")
    w0 = conv.init(jax.random.PRNGKey(0), x)

    def chain_t2d(x, w0):
        def step(c, _):
            return conv.apply(w0, c) * 1e-2, None
        xf, _ = lax.scan(step, x, None, length=K)
        return jnp.sum(xf)

    timeit(f"{sname} im2col fwd", chain_i2c, x, kern, bias, flops=CONV_FLOPS)
    timeit(f"{sname} t2d fwd", chain_t2d, x, w0, flops=CONV_FLOPS)
print("probe52 done", flush=True)
