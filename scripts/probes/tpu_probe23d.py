"""probe23 redo #3: scalar host fetch + N=1000.

probe23b/c fetched the full MB-sized carry through the relay every timed call;
at the relay's ~10-30 MB/s that fetch swamps 100 steps of sub-100us bodies.
Return jnp.sum(z) instead (4-byte fetch still forces the whole chain) and use
N=1000 so device time also dominates per-dispatch relay latency.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

N = 1000


def run_case(tag, shape, hidden, kind, dtype):
    C = shape[-1]
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(*shape).astype(np.float32), dtype)
    w1 = jnp.asarray(rs.randn(C, hidden).astype(np.float32) / np.sqrt(C), dtype)
    b1 = jnp.zeros((hidden,), dtype)
    w2 = jnp.asarray(rs.randn(hidden, C).astype(np.float32) / np.sqrt(hidden), dtype)
    b2 = jnp.zeros((C,), dtype)

    def body(z, w1, b1, w2, b2):
        shp = z.shape
        if kind in ("ffn2d", "mm2d"):
            z = z.reshape(-1, shp[-1])
        h = z @ w1 + b1
        if kind != "mm2d":
            h = jax.nn.gelu(h, approximate=False)
        o = h @ w2 + b2
        return o.reshape(shp)

    @jax.jit
    def loop(x, seed, w1, b1, w2, b2):
        x = x * (1.0 + 1e-6 * seed.astype(dtype))  # new value each call, no refetch
        def step(z, _):
            o = body(z, w1, b1, w2, b2)
            o = o * jax.lax.rsqrt(
                jnp.mean(jnp.square(o).astype(jnp.float32)) + 1e-6
            ).astype(o.dtype)
            return o, None
        z, _ = jax.lax.scan(step, x, None, length=N)
        return jnp.sum(z.astype(jnp.float32))

    s0 = loop(x, jnp.float32(0), w1, b1, w2, b2)
    _ = float(np.asarray(s0))
    t0 = time.perf_counter()
    for i in range(3):
        s = float(np.asarray(loop(x, jnp.float32(i + 1), w1, b1, w2, b2)))
    dt = (time.perf_counter() - t0) / 3 / N
    flops = 2 * 2 * int(np.prod(shape[:-1])) * C * hidden
    print(f"  {tag:14s}: {dt*1e6:8.1f} us/call  {flops/dt/1e12:6.1f} TFLOP/s  [chk {s:.3e}]",
          flush=True)


for shape, hidden in [((1, 13, 16, 16, 256), 1024), ((1, 13, 8, 8, 512), 2048)]:
    print(f"shape {shape} hidden {hidden}", flush=True)
    run_case("mm2d", shape, hidden, "mm2d", jnp.float32)
    run_case("ffn5d", shape, hidden, "ffn5d", jnp.float32)
    run_case("ffn2d", shape, hidden, "ffn2d", jnp.float32)
    run_case("ffn2d+bf16", shape, hidden, "ffn2d", jnp.bfloat16)
