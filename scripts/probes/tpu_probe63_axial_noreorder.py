"""Round-3 probe W: would a reorder-free axial attention help the TRAIN path?

The XLA (einsum) attention path — which training uses whenever dropout is
active — runs cuboid_reorder before qkv and reorder_reverse after proj; for
the T- and H-axis axial patterns those are real HBM transposes fwd AND bwd
(probe41: ~11 ms/step at B=8).  Alternative: run qkv on the natural
(B,T,H,W,C) layout and einsum the attention along the axis directly.
Measures fwd+bwd (value_and_grad) of one attention layer per-axis, both
formulations, B=8 train shapes, chained scalar-fetch loops.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
B, T, H, W, C = 8, 13, 16, 16, 256
heads, hc = 4, 64
K, NITER = 20, 5
rs = np.random.RandomState(0)
x0 = jnp.asarray(rs.rand(B, T, H, W, C).astype(np.float32))
wqkv = jnp.asarray(rs.randn(C, 3 * C).astype(np.float32) * 0.02)
wproj = jnp.asarray(rs.randn(C, C).astype(np.float32) * 0.02)


def attn_reorder(x, axis):
    """Reference formulation: reorder -> qkv -> per-cuboid einsum -> reverse."""
    # axial reorder: bring `axis` to position -2 over flattened others
    perm = {0: (0, 2, 3, 1, 4), 1: (0, 1, 3, 2, 4), 2: (0, 1, 2, 3, 4)}[axis]
    vol = (T, H, W)[axis]
    xr = x.transpose(perm).reshape(B, -1, vol, C)
    qkv = (xr @ wqkv).reshape(B, -1, vol, 3, heads, hc)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    s = jnp.einsum("bnihc,bnjhc->bnhij", q * hc**-0.5, k)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnhij,bnjhc->bnihc", p, v).reshape(B, -1, vol, C)
    o = o @ wproj
    inv = {0: (0, 3, 1, 2, 4), 1: (0, 1, 3, 2, 4), 2: (0, 1, 2, 3, 4)}[axis]
    shp = {0: (B, H, W, T, C), 1: (B, T, W, H, C), 2: (B, T, H, W, C)}[axis]
    return o.reshape(shp).transpose(inv)


SCORE = {0: "bihwnc,bjhwnc->bhwnij",
         1: "btiwnc,btjwnc->btwnij",
         2: "bthinc,bthjnc->bthnij"}
MIX = {0: "bhwnij,bjhwnc->bihwnc",
       1: "btwnij,btjwnc->btiwnc",
       2: "bthnij,bthjnc->bthinc"}


def attn_natural(x, axis):
    """Reorder-free: qkv on the natural layout, einsum along the axis."""
    qkv = (x @ wqkv).reshape(B, T, H, W, 3, heads, hc)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    s = jnp.einsum(SCORE[axis], q * hc**-0.5, k)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum(MIX[axis], p, v)
    return o.reshape(B, T, H, W, C) @ wproj


for axis in (0, 1, 2):
    a = attn_reorder(x0, axis)
    b = attn_natural(x0, axis)
    d = float(jnp.max(jnp.abs(a - b)))
    print(f"axis {axis}: formulations agree to {d:.2e}", flush=True)

for name, fn in (("reorder", attn_reorder), ("natural", attn_natural)):
    for axis in (0, 1, 2):
        def loss(x):
            return jnp.sum(jnp.sin(fn(x, axis)))

        @jax.jit
        def chain(x):
            def body(xc, _):
                g = jax.grad(loss)(xc)
                return xc + 1e-6 * g, None
            xf, _ = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(xf)

        _ = float(np.asarray(chain(x0)))
        t0 = time.perf_counter()
        for i in range(NITER):
            _ = float(np.asarray(chain(x0 * (1.0 + 1e-9 * i))))
        dt = (time.perf_counter() - t0) / (NITER * K)
        print(f"{name} axis {axis}: {dt*1e6:8.1f} us/iter (fwd+bwd)", flush=True)
print("probe63 done", flush=True)
