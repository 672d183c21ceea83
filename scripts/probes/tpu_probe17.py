"""Round-2 probe: 3x3x3 conv impls timed INSIDE one compiled 100-step scan
(per-dispatch relay overhead polluted probe16; probe13 B showed scan == truth).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

SHAPES = [
    ((1, 13, 16, 16, 256), 256),   # stage 1
    ((1, 13, 8, 8, 512), 512),     # stage 2
]
N = 100


def conv_xla(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NTHWC", "THWIO", "NTHWC")
        ),
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
    out = patches @ w.reshape(27 * C, OC)
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
                acc = acc + sl @ k[i]
                i += 1
    return acc.reshape(B, T, H, W, OC) + b


def bench(f, x, w, b, tag, flops):
    @jax.jit
    def loop(x, w, b):
        def body(z, _):
            return f(z, w, b), None
        z, _ = jax.lax.scan(body, x, None, length=N)
        return z

    out = loop(x, w, b)
    warm = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    for i in range(3):
        out = loop(out, w, b)
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
    w = jnp.asarray(rs.randn(3, 3, 3, C, oc).astype(np.float32)) * (0.5 / np.sqrt(27 * C))
    b = jnp.zeros((oc,), jnp.float32)
    bench(conv_xla, x, w, b, "conv", flops)
    bench(conv_im2col, x, w, b, "im2col", flops)
    bench(conv_shift, x, w, b, "shift", flops)
