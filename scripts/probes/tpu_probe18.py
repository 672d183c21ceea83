"""Round-2 probe: bf16 3x3x3 conv impls in-scan at the stage-2 hot shape.

In-model baseline (profiler): stage-2 conv fusion = 349 us (33.8 TF/s, bf16
inputs, pathological T(1,128) output layout); stage-1 = 93 us (127 TF/s).
Variants (all bf16 in / f32 out):
  conv   : lax conv_general_dilated
  im2col : one (THW, 27C) @ (27C, OC) GEMM
  shift  : 27 accumulated (THW, C) @ (C, OC) GEMMs
  t2d    : temporal decomposition: out[t] = sum_dt conv2d(x[t+dt], w[dt])
           (3 2D convs with T folded into batch)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

N = 100
SHAPES = [
    ((1, 13, 16, 16, 256), 256),
    ((1, 13, 8, 8, 512), 512),
]


def conv_xla(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NTHWC", "THWIO", "NTHWC")
        ),
        preferred_element_type=jnp.float32,
    ) + b


def conv_im2col(x, w, b):
    B, T, H, W, C = x.shape
    OC = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dt:dt + T, dh:dh + H, dw:dw + W, :]
        for dt in range(3) for dh in range(3) for dw in range(3)
    ]
    patches = jnp.concatenate(cols, axis=-1).reshape(B * T * H * W, 27 * C)
    out = jax.lax.dot(patches, w.reshape(27 * C, OC),
                      preferred_element_type=jnp.float32)
    return out.reshape(B, T, H, W, OC) + b


def conv_shift(x, w, b):
    B, T, H, W, C = x.shape
    OC = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((B * T * H * W, OC), jnp.float32)
    k = w.reshape(27, C, OC)
    i = 0
    for dt in range(3):
        for dh in range(3):
            for dw in range(3):
                sl = xp[:, dt:dt + T, dh:dh + H, dw:dw + W, :].reshape(-1, C)
                acc = acc + jax.lax.dot(sl, k[i], preferred_element_type=jnp.float32)
                i += 1
    return acc.reshape(B, T, H, W, OC) + b


def conv_t2d(x, w, b):
    B, T, H, W, C = x.shape
    OC = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dt in range(3):
        xt = xp[:, dt:dt + T].reshape(B * T, H, W, C)
        o = jax.lax.conv_general_dilated(
            xt, w[dt], window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                xt.shape, w[dt].shape, ("NHWC", "HWIO", "NHWC")
            ),
            preferred_element_type=jnp.float32,
        )
        out = o if out is None else out + o
    return out.reshape(B, T, H, W, OC) + b


def bench(f, x, w, b, tag, flops):
    @jax.jit
    def loop(x, w, b):
        def body(z, _):
            z = f(z.astype(jnp.bfloat16), w, b)
            return z.astype(jnp.bfloat16), None
        z, _ = jax.lax.scan(body, x.astype(jnp.bfloat16), None, length=N)
        return z

    wb = w.astype(jnp.bfloat16)
    out = loop(x, wb, b)
    _ = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    for i in range(3):
        out = loop(out.astype(jnp.float32), wb, b)
        s = float(np.asarray(out, np.float32).sum())
    dt = (time.perf_counter() - t0) / 3 / N
    print(f"  {tag:8s}: {dt*1e6:8.1f} us/call  {flops/dt/1e12:6.1f} TFLOP/s  [chk {s:.3e}]",
          flush=True)


for shape, oc in SHAPES:
    B, T, H, W, C = shape
    flops = 2 * B * T * H * W * C * oc * 27
    print(f"shape {shape} -> {oc}ch  ({flops/1e9:.1f} GFLOP)", flush=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32)) * 0.02
    w = jnp.asarray(rs.randn(3, 3, 3, C, oc).astype(np.float32)) * (0.9 / np.sqrt(27 * C))
    b = jnp.zeros((oc,), jnp.float32)
    bench(conv_xla, x, w, b, "conv", flops)
    bench(conv_im2col, x, w, b, "im2col", flops)
    bench(conv_shift, x, w, b, "shift", flops)
    bench(conv_t2d, x, w, b, "t2d", flops)
