"""Per-component scan-step costs: where do the ~14 ms/step go?"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from prediff_tpu.models.cuboid_attention import StackCuboidSelfAttentionBlock
from prediff_tpu.models.layers import TimeEmbedResBlock

N = 100
B = 1


def timeit_host(fn, *args, n=2):
    out = fn(*args)
    _ = float(np.asarray(out).sum())
    t0 = time.perf_counter()
    for _i in range(n):
        out = fn(*args)
        _ = float(np.asarray(out).sum())
    return (time.perf_counter() - t0) / n


def scan_of(module, params, x, extra=None):
    @jax.jit
    def fn(p, x0):
        def body(x, t):
            if extra == "temb":
                out = module.apply({"params": p}, x, t_emb)
            else:
                out = module.apply({"params": p}, x)
            return x * 0.9 + 0.1 * out, None
        xf, _ = jax.lax.scan(body, x0, jnp.arange(N, dtype=jnp.int32))
        return xf
    return fn


rng = jax.random.PRNGKey(0)
shape0 = (B, 13, 16, 16, 256)
x0 = jnp.asarray(np.random.RandomState(0).randn(*shape0).astype(np.float32))

# 1) one stack block (3 axial attentions + 3 FFNs) at stage-0 resolution
stack = StackCuboidSelfAttentionBlock(
    dim=256, num_heads=4,
    block_cuboid_size=[(13, 1, 1), (1, 16, 1), (1, 1, 16)],
    block_shift_size=[(0, 0, 0)] * 3,
    block_strategy=[("l", "l", "l")] * 3,
    padding_type="zeros", activation="gelu", use_inter_ffn=True,
)
sp = jax.jit(stack.init)(rng, x0)["params"]
dt = timeit_host(scan_of(stack, sp, x0), sp, x0)
print(f"stack block (3 attn+3 ffn) x{N}: {dt*1000:.0f} ms -> {dt/N*1e3:.2f} ms/iter", flush=True)

# 2) one TimeEmbedResBlock at stage-0 resolution
temb = jnp.asarray(np.random.RandomState(1).randn(B, 1024).astype(np.float32))
res = TimeEmbedResBlock(channels=256, emb_channels=1024, out_channels=256,
                        use_embed=True)
rp = jax.jit(res.init)(rng, x0, temb)["params"]
dt = timeit_host(scan_of(res, rp, x0, extra="temb"), rp, x0)
print(f"time-embed resblock x{N}:       {dt*1000:.0f} ms -> {dt/N*1e3:.2f} ms/iter", flush=True)

# 3) stage-1 stack (8x8, dim 512)
shape1 = (B, 13, 8, 8, 512)
x1 = jnp.asarray(np.random.RandomState(2).randn(*shape1).astype(np.float32))
stack1 = StackCuboidSelfAttentionBlock(
    dim=512, num_heads=4,
    block_cuboid_size=[(13, 1, 1), (1, 8, 1), (1, 1, 8)],
    block_shift_size=[(0, 0, 0)] * 3,
    block_strategy=[("l", "l", "l")] * 3,
    padding_type="zeros", activation="gelu", use_inter_ffn=True,
)
sp1 = jax.jit(stack1.init)(rng, x1)["params"]
dt = timeit_host(scan_of(stack1, sp1, x1), sp1, x1)
print(f"stage-1 stack block x{N}:       {dt*1000:.0f} ms -> {dt/N*1e3:.2f} ms/iter", flush=True)
