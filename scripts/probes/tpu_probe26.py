"""Round-2 probe: standalone cuboid attention layer cost by formulation.

Stage-1 axial-W shape (nC=208, vol=16, C=256, heads=4).  Variants:
  einsum    : the model's current path (LN + qkv Dense + bnihc einsums + proj)
  headlast  : einsums keeping heads in the trailing dim (different transpose)
  premuted  : qkv reshaped head-major BEFORE attention via one transpose
  v3kernel  : whole-layer Pallas kernel (fused_cuboid_attention_layer)
Methodology per CLAUDE.md: weights as jit args, scalar fetch, N=1000 scan.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.ops.pallas_attention import fused_cuboid_attention_layer

N = 300
B, nC, vol, C, heads = 1, 208, 16, 256, 4
hc = C // heads
scale = hc ** -0.5


def ln(x, s, b):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + 1e-5) * s + b


def attn_einsum(x, s, b, wqkv, bias, wproj, bproj):
    h = ln(x, s, b)
    qkv = (h @ wqkv).reshape(B, nC, vol, 3, heads, hc)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    sc = jnp.einsum("bnihc,bnjhc->bnhij", q * scale, k) + bias[None, None]
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bnhij,bnjhc->bnihc", p, v).reshape(B, nC, vol, C)
    return x + (o @ wproj + bproj)


def attn_headlast(x, s, b, wqkv, bias, wproj, bproj):
    h = ln(x, s, b)
    qkv = (h @ wqkv).reshape(B, nC, vol, 3, heads, hc)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    sc = jnp.einsum("bnihc,bnjhc->bnijh", q * scale, k) + bias.transpose(1, 2, 0)[None, None]
    p = jax.nn.softmax(sc, axis=-2)
    o = jnp.einsum("bnijh,bnjhc->bnihc", p, v).reshape(B, nC, vol, C)
    return x + (o @ wproj + bproj)


def attn_premuted(x, s, b, wqkv, bias, wproj, bproj):
    h = ln(x, s, b)
    qkv = (h @ wqkv).reshape(B, nC, vol, 3, heads, hc)
    qkv = qkv.transpose(0, 3, 4, 1, 2, 5)  # (B, 3, heads, nC, vol, hc) one copy
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    sc = jnp.einsum("bhnic,bhnjc->bhnij", q * scale, k) + bias[None, :, None]
    p = jax.nn.softmax(sc, axis=-1)
    o = jnp.einsum("bhnij,bhnjc->bhnic", p, v)
    o = o.transpose(0, 2, 3, 1, 4).reshape(B, nC, vol, C)
    return x + (o @ wproj + bproj)


def attn_v3(x, s, b, wqkv, bias, wproj, bproj):
    return x + fused_cuboid_attention_layer(
        x, s, b, wqkv, bias, wproj, bproj, num_heads=heads, scale=scale,
        interpret=jax.default_backend() != "tpu",
    )


def bench(tag, f):
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, nC, vol, C).astype(np.float32) * 0.3)
    s = jnp.ones((C,), jnp.float32)
    bb = jnp.zeros((C,), jnp.float32)
    wqkv = jnp.asarray(rs.randn(C, 3 * C).astype(np.float32) / np.sqrt(C))
    bias = jnp.asarray(rs.randn(heads, vol, vol).astype(np.float32) * 0.02)
    wproj = jnp.asarray(rs.randn(C, C).astype(np.float32) / np.sqrt(C))
    bproj = jnp.zeros((C,), jnp.float32)

    @jax.jit
    def loop(x, seed, *w):
        x = x * (1.0 + 1e-6 * seed)
        def step(z, _):
            o = f(z, *w)
            o = o * jax.lax.rsqrt(jnp.mean(jnp.square(o)) + 1e-6)
            return o, None
        z, _ = jax.lax.scan(step, x, None, length=N)
        return jnp.sum(z)

    args = (s, bb, wqkv, bias, wproj, bproj)
    print(f"compiling {tag}...", flush=True)
    _ = float(np.asarray(loop(x, jnp.float32(0), *args)))
    t0 = time.perf_counter()
    for i in range(3):
        sm = float(np.asarray(loop(x, jnp.float32(i + 1), *args)))
    dt = (time.perf_counter() - t0) / 3 / N
    print(f"{tag:10s}: {dt*1e6:7.1f} us/layer  [chk {sm:.4e}]", flush=True)


bench("einsum", attn_einsum)
bench("headlast", attn_headlast)
bench("premuted", attn_premuted)
bench("v3kernel", attn_v3)
