"""Round-2 probe: 3x3x3 conv implementations at the UNet's hot shapes (B=1).

probe15: 88% of the forward is conv fusions; stage-2 (13,8,8,512) convs run at
~8.4 TFLOP/s vs stage-1 (13,16,16,256) at ~29.  Candidates:
  conv  : lax.conv_general_dilated (what nn.Conv emits today)
  im2col: pad + 27 shifted slices concatenated -> ONE (B*THW, 27C) @ (27C, OC)
  shift : 27 accumulated (B*THW, C) @ (C, OC) matmuls, no materialization
All should hit the MXU as plain GEMMs; measures 100 chained calls, host fetch.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

SHAPES = [
    ((1, 13, 16, 16, 256), 256),   # stage 1
    ((1, 13, 8, 8, 512), 512),     # stage 2
]
N = 100


def conv_ref(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1), padding=((1, 1),) * 3,
        dimension_numbers=("NTHWC"[0] + "THW" + "C", "THWIO"[:3] + "IO", "NTHWC"[0] + "THW" + "C"),
    ) + b


def conv_ref2(x, w, b):
    # exactly what flax nn.Conv does
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
    fj = jax.jit(f)
    out = fj(x, w, b)
    warm = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    z = x
    for i in range(N):
        z = fj(z, w, b)
    s = float(np.asarray(z, np.float32).sum())
    dt = (time.perf_counter() - t0) / N
    print(f"  {tag:8s}: {dt*1e6:8.1f} us/call  {flops/dt/1e12:6.1f} TFLOP/s  [chk {s:.3e}]",
          flush=True)


for shape, oc in SHAPES:
    B, T, H, W, C = shape
    flops = 2 * B * T * H * W * C * oc * 27
    print(f"shape {shape} -> {oc}ch  ({flops/1e9:.1f} GFLOP)", flush=True)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32)) * 0.02
    w = jnp.asarray(rs.randn(3, 3, 3, C, oc).astype(np.float32)) * (0.5 / np.sqrt(27 * C))
    b = jnp.asarray(rs.randn(oc).astype(np.float32)) * 0.0
    bench(conv_ref2, x, w, b, "conv", flops)
    bench(conv_im2col, x, w, b, "im2col", flops)
    bench(conv_shift, x, w, b, "shift", flops)
