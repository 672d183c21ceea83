"""Round-3 probe F: isolate the two train-step backward pathologies probe44
attributed (B=8 v1 shapes):

A) FFN pair bwd — probe44 shows ~1.07 ms x24 `(f32[1024], bf16[...])` tuple
   fusions at ffn_2/dot_general transpose: XLA multi-output-fuses the tiny
   bias-grad reduce with the (8,13,16,16,1024) GELU-grad elementwise op and
   the reduce's emitter serializes the fusion (~7x off HBM roofline).
   Variant 'barrier' recomputes db from an optimization_barrier'd dy so the
   big elementwise fusion stays reduce-free.

B) Conv3x3x3 (t2d) fwd vs fwd+dx vs fwd+dx+dw at the time-embed-block
   shapes — probe44 shows the transpose fusions at ~2x forward cost; is
   that honest 2-conv work or a layout pathology (compare impl='xla', bf16)?

Timing per CLAUDE.md: weights as jit args, chained carries, lax.scan K=50,
device-side scalar fetch.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), flush=True)
K = 50


def timeit(tag, fn, *args, flops=None):
    fn = jax.jit(fn)
    out = fn(*args)
    _ = float(np.asarray(out))
    t0 = time.perf_counter()
    _ = float(np.asarray(fn(*args)))
    dt = (time.perf_counter() - t0) / K
    extra = f"  {flops/dt/1e12:7.1f} TF/s" if flops else ""
    print(f"{tag:42s}: {dt*1e6:9.1f} us/iter{extra}", flush=True)
    return dt


# ---------------------------------------------------------------- A) FFN
B, T, H, W, C, HID = 8, 13, 16, 16, 256, 1024
N = B * T * H * W
rs = np.random.RandomState(0)
x0 = jnp.asarray(rs.rand(N, C).astype(np.float32))
w1 = jnp.asarray(rs.rand(C, HID).astype(np.float32) * 0.02)
b1 = jnp.zeros((HID,), jnp.float32)
w2 = jnp.asarray(rs.rand(HID, C).astype(np.float32) * 0.02)
b2 = jnp.zeros((C,), jnp.float32)
FFN_FLOPS = 2 * N * C * HID * 2 * 3  # fwd + dx + dw, both matmul pairs


def ffn(x, w1, b1, w2, b2):
    return jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2


# explicit manual backward so the barrier variant is a one-line diff
def ffn_bwd_plain(x, dy, w1, b1, w2, b2):
    h = x @ w1 + b1
    a = jax.nn.gelu(h, approximate=False)
    db2 = jnp.sum(dy, 0)
    dw2 = a.T @ dy
    da = dy @ w2.T
    dh = jax.vjp(lambda t: jax.nn.gelu(t, approximate=False), h)[1](da)[0]
    db1 = jnp.sum(dh, 0)
    dw1 = x.T @ dh
    dx = dh @ w1.T
    return dx, dw1, db1, dw2, db2


def ffn_bwd_barrier(x, dy, w1, b1, w2, b2):
    h = x @ w1 + b1
    a = jax.nn.gelu(h, approximate=False)
    db2 = jnp.sum(lax.optimization_barrier(dy), 0)
    dw2 = a.T @ dy
    da = dy @ w2.T
    dh = jax.vjp(lambda t: jax.nn.gelu(t, approximate=False), h)[1](da)[0]
    db1 = jnp.sum(lax.optimization_barrier(dh), 0)
    dw1 = x.T @ dh
    dx = dh @ w1.T
    return dx, dw1, db1, dw2, db2


def chain_ffn(bwd_fn):
    def step(carry, _):
        x, s = carry
        y = ffn(x, w1_a, b1_a, w2_a, b2_a)
        dx, dw1, db1, dw2, db2 = bwd_fn(x, y * 1e-3, w1_a, b1_a, w2_a, b2_a)
        s = s + jnp.sum(dw1) + jnp.sum(db1) + jnp.sum(dw2) + jnp.sum(db2)
        return (x + dx * 1e-3, s), 0.0
    return step


def run_chain(step, init):
    (xf, s), _ = lax.scan(step, init, None, length=K)
    return s + jnp.sum(xf) * 1e-9


# autodiff reference (what the train step actually runs)
def chain_ffn_autodiff():
    def step(carry, _):
        x, s = carry
        (y, vjp) = jax.vjp(lambda x, w1, b1, w2, b2: ffn(x, w1, b1, w2, b2),
                           x, w1_a, b1_a, w2_a, b2_a)
        dx, dw1, db1, dw2, db2 = vjp(y * 1e-3)
        s = s + jnp.sum(dw1) + jnp.sum(db1) + jnp.sum(dw2) + jnp.sum(db2)
        return (x + dx * 1e-3, s), 0.0
    return step


for tag, mk in [("ffn autodiff fwd+bwd", chain_ffn_autodiff()),
                ("ffn manual-plain fwd+bwd", chain_ffn(ffn_bwd_plain)),
                ("ffn manual-barrier fwd+bwd", chain_ffn(ffn_bwd_barrier))]:
    def outer(x, s, w1, b1, w2, b2, step=mk):
        global w1_a, b1_a, w2_a, b2_a
        w1_a, b1_a, w2_a, b2_a = w1, b1, w2, b2
        return run_chain(step, (x, s))
    timeit(tag, outer, x0, jnp.zeros(()), w1, b1, w2, b2, flops=FFN_FLOPS)

# sanity: barrier == plain numerics
d1 = ffn_bwd_plain(x0[:256], x0[:256] @ w1 @ w2 * 1e-3, w1, b1, w2, b2)
d2 = ffn_bwd_barrier(x0[:256], x0[:256] @ w1 @ w2 * 1e-3, w1, b1, w2, b2)
err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(d1, d2))
print(f"barrier == plain: max|diff| {err:.2e}", flush=True)

# ---------------------------------------------------------------- B) conv
from prediff_tpu.models.layers import Conv3x3x3

for impl in ("t2d", "xla"):
    for dt_name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        conv = Conv3x3x3(features=C, impl=impl)
        xc = jnp.asarray(rs.rand(B, T, H, W, C).astype(np.float32)).astype(dt)
        params = conv.init(jax.random.PRNGKey(0), xc)
        w = jax.tree_util.tree_map(lambda a: a.astype(dt), params)
        CONV_FLOPS = 2 * 27 * B * T * H * W * C * C

        def fwd_chain(x, w):
            def step(c, _):
                return conv.apply(w, c) * 1e-2, 0.0
            xf, _ = lax.scan(step, x, None, length=K)
            return jnp.sum(xf.astype(jnp.float32))

        def fwd_dx_chain(x, w):
            def step(c, _):
                y, vjp = jax.vjp(lambda x: conv.apply(w, x), c)
                (dx,) = vjp(y * 1e-3)
                return dx, 0.0
            xf, _ = lax.scan(step, x, None, length=K)
            return jnp.sum(xf.astype(jnp.float32))

        def full_chain(x, w):
            def step(carry, _):
                c, s = carry
                y, vjp = jax.vjp(lambda x, w: conv.apply(w, x), c, w)
                dx, dw = vjp(y * 1e-3)
                s = s + sum(jnp.sum(l.astype(jnp.float32))
                            for l in jax.tree_util.tree_leaves(dw))
                return (dx, s), 0.0
            (xf, s), _ = lax.scan(step, (x, jnp.zeros(())), None, length=K)
            return s + jnp.sum(xf.astype(jnp.float32)) * 1e-9

        t_f = timeit(f"conv {impl} {dt_name} fwd", fwd_chain, xc, w,
                     flops=CONV_FLOPS)
        t_fdx = timeit(f"conv {impl} {dt_name} fwd+dx", fwd_dx_chain, xc, w,
                       flops=2 * CONV_FLOPS)
        t_all = timeit(f"conv {impl} {dt_name} fwd+dx+dw", full_chain, xc, w,
                       flops=3 * CONV_FLOPS)
        print(f"  -> dx {1e6*(t_fdx-t_f):7.1f} us, dw {1e6*(t_all-t_fdx):7.1f} us "
              f"(fwd {1e6*t_f:7.1f})", flush=True)
print("probe46 done", flush=True)
