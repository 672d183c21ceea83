"""Round-3 probe H: t2d vs native-XLA 3-D conv at BOTH UNet stages' TRAIN
shapes (probe46 showed xla faster at stage-0 B=8; stage 1 is the 8x8x512
config where XLA picked the pathological transposed layout at B=1 —
probe15/18-19 — so verify B=8 before switching the train path).

Also the B=1 sampling shapes as a guard: t2d must stay the sampler default.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from prediff_tpu.models.layers import Conv3x3x3

print("backend:", jax.default_backend(), flush=True)
K = 50


def timeit(tag, fn, *args, flops=None):
    fn = jax.jit(fn)
    _ = float(np.asarray(fn(*args)))
    t0 = time.perf_counter()
    _ = float(np.asarray(fn(*args)))
    dt = (time.perf_counter() - t0) / K
    extra = f"  {flops/dt/1e12:7.1f} TF/s" if flops else ""
    print(f"{tag:44s}: {dt*1e6:9.1f} us/iter{extra}", flush=True)
    return dt


rs = np.random.RandomState(0)
SHAPES = [
    ("train stage0", (8, 13, 16, 16, 256)),
    ("train stage1", (8, 13, 8, 8, 512)),
    ("sample stage0", (1, 13, 16, 16, 256)),
    ("sample stage1", (1, 13, 8, 8, 512)),
]
for sname, (B, T, H, W, C) in SHAPES:
    CONV_FLOPS = 2 * 27 * B * T * H * W * C * C
    xc = jnp.asarray(rs.rand(B, T, H, W, C).astype(np.float32))
    for impl in ("t2d", "xla"):
        conv = Conv3x3x3(features=C, impl=impl)
        w = conv.init(jax.random.PRNGKey(0), xc)

        def full_chain(x, w, conv=conv):
            def step(carry, _):
                c, s = carry
                y, vjp = jax.vjp(lambda x, w: conv.apply(w, x), c, w)
                dx, dw = vjp(y * 1e-3)
                s = s + sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(dw))
                return (dx, s), 0.0
            (xf, s), _ = lax.scan(step, (x, jnp.zeros(())), None, length=K)
            return s + jnp.sum(xf) * 1e-9

        def fwd_chain(x, w, conv=conv):
            def step(c, _):
                return conv.apply(w, c) * 1e-2, 0.0
            xf, _ = lax.scan(step, x, None, length=K)
            return jnp.sum(xf)

        timeit(f"{sname} {impl} fwd", fwd_chain, xc, w, flops=CONV_FLOPS)
        timeit(f"{sname} {impl} fwd+dx+dw", full_chain, xc, w,
               flops=3 * CONV_FLOPS)
print("probe48 done", flush=True)
