"""Round-2 probe: t2d conv vs OC-batched t2d ("t2doc").

t2d:   out[t] = sum_dt conv2d(x[t+dt], k[dt])      (3 convs, N=OC)
t2doc: y = conv2d(x, concat_OC(k0,k1,k2))          (1 conv, N=3*OC)
       out[t] = y2[t-1] + y1[t] + y0[t+1]          (one shifted-add fusion)
Same FLOPs and same HBM traffic; 1/3 the conv launches, 3x wider MXU N.
Methodology: weights as args, scalar fetch, long scan.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

N = 300
SHAPES = [((1, 13, 16, 16, 256), 256), ((1, 13, 8, 8, 512), 512)]


def conv2d(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC")),
    )


def t2d(x, w, b):
    B, T, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    out = None
    for dt in range(3):
        o = conv2d(xp[:, dt:dt + T].reshape(B * T, H, W, C), w[dt])
        out = o if out is None else out + o
    return out.reshape(B, T, H, W, -1) + b


def t2doc(x, w, b):
    B, T, H, W, C = x.shape
    OC = w.shape[-1]
    wc = jnp.concatenate([w[0], w[1], w[2]], axis=-1)  # (3,3,C,3OC)
    y = conv2d(x.reshape(B * T, H, W, C), wc).reshape(B, T, H, W, 3, OC)
    y0, y1, y2 = y[..., 0, :], y[..., 1, :], y[..., 2, :]
    zrow = jnp.zeros_like(y0[:, :1])
    # out[t] = y2[t-1] + y1[t] + y0[t+1]
    out = (jnp.concatenate([zrow, y2[:, :-1]], axis=1) + y1
           + jnp.concatenate([y0[:, 1:], zrow], axis=1))
    return out + b


def bench(tag, f, shape, oc):
    B, T, H, W, C = shape
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32) * 0.3)
    w = jnp.asarray(rs.randn(3, 3, 3, C, oc).astype(np.float32) / np.sqrt(27 * C))
    b = jnp.zeros((oc,), jnp.float32)

    @jax.jit
    def loop(x, seed, w, b):
        x = x * (1.0 + 1e-6 * seed)
        def step(z, _):
            o = f(z, w, b)
            o = o * jax.lax.rsqrt(jnp.mean(jnp.square(o)) + 1e-6)
            return o, None
        z, _ = jax.lax.scan(step, x, None, length=N)
        return jnp.sum(z)

    print(f"compiling {tag} {shape}...", flush=True)
    _ = float(np.asarray(loop(x, jnp.float32(0), w, b)))
    t0 = time.perf_counter()
    for i in range(3):
        s = float(np.asarray(loop(x, jnp.float32(i + 1), w, b)))
    dt = (time.perf_counter() - t0) / 3 / N
    flops = 2 * B * T * H * W * C * oc * 27
    print(f"  {tag:6s}: {dt*1e6:7.1f} us/conv  {flops/dt/1e12:6.1f} TFLOP/s  [chk {s:.3e}]",
          flush=True)


for shape, oc in SHAPES:
    bench("t2d", t2d, shape, oc)
    bench("t2doc", t2doc, shape, oc)
