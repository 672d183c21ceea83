"""Round-2 probe: v4 whole-layer attention kernel vs einsum path.

(a) standalone layer at the stage-1 axial-W shape (probe26 methodology:
    einsum was 127.3 us/layer, v3 149.9)
(b) full sampling chain with use_pallas_attention='layer' (v4) + fused FFN.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from prediff_tpu.ops.pallas_attention import fused_cuboid_attention_layer_v4

N = 300
B, nC, vol, C, heads = 1, 208, 16, 256, 4
scale = (C // heads) ** -0.5


def attn_v4(x, s, b, wqkv, bias, wproj, bproj):
    return x + fused_cuboid_attention_layer_v4(
        x, s, b, wqkv, bias, wproj, bproj, num_heads=heads, scale=scale,
        interpret=jax.default_backend() != "tpu",
    )


rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(B, nC, vol, C).astype(np.float32) * 0.3)
args = (
    jnp.ones((C,), jnp.float32), jnp.zeros((C,), jnp.float32),
    jnp.asarray(rs.randn(C, 3 * C).astype(np.float32) / np.sqrt(C)),
    jnp.asarray(rs.randn(heads, vol, vol).astype(np.float32) * 0.02),
    jnp.asarray(rs.randn(C, C).astype(np.float32) / np.sqrt(C)),
    jnp.zeros((C,), jnp.float32),
)


@jax.jit
def loop(x, seed, *w):
    x = x * (1.0 + 1e-6 * seed)
    def step(z, _):
        o = attn_v4(z, *w)
        o = o * jax.lax.rsqrt(jnp.mean(jnp.square(o)) + 1e-6)
        return o, None
    z, _ = jax.lax.scan(step, x, None, length=N)
    return jnp.sum(z)


print("compiling v4 standalone...", flush=True)
_ = float(np.asarray(loop(x, jnp.float32(0), *args)))
t0 = time.perf_counter()
for i in range(3):
    sm = float(np.asarray(loop(x, jnp.float32(i + 1), *args)))
dt = (time.perf_counter() - t0) / 3 / N
print(f"v4kernel  : {dt*1e6:7.1f} us/layer  [chk {sm:.4e}]  (einsum was 127.3, v3 149.9)",
      flush=True)

# ---- in-model chain ------------------------------------------------------ #
from prediff_tpu.config import prediff_default_config
from prediff_tpu.factory import build_pipeline

M = 100
y = jnp.asarray(np.random.RandomState(0).rand(B, 7, 128, 128, 1).astype(np.float32))
for tag, mode in [("einsum+pffn", False), ("v4+pffn", "layer")]:
    cfg = prediff_default_config()
    cfg.model.latent_model.use_pallas_attention = mode
    ld, params = build_pipeline(cfg, rng=jax.random.PRNGKey(0), with_alignment=False)

    def run(seed):
        out = ld.sample(params["unet"], params["vae"], jax.random.PRNGKey(seed), y,
                        timesteps=M, return_decoded=True)
        return jnp.sum(out)
    print(f"compiling chain {tag}...", flush=True)
    _ = float(np.asarray(run(0)))
    t0 = time.perf_counter()
    for i in range(3):
        s = float(np.asarray(run(i + 1)))
    dt = (time.perf_counter() - t0) / 3 / M
    print(f"{tag:12s}: {dt*1e3:6.3f} ms/step ({1/dt:6.1f} steps/s)  [chk {s:.4e}]",
          flush=True)
