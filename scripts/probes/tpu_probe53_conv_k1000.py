"""Round-3 probe M: conv variants re-measured at K=1000 (protocol check).

probes 48/50/52 used K=50-200 scans; the relay's fixed dispatch+fetch cost
(~tens of ms) divided by K contaminates per-iter numbers at that length
(CLAUDE.md: N>=1000).  Re-measure the B=1 conv variants with K=1000 AND
report the K=250-vs-K=1000 delta to quantify the fixed overhead directly.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from prediff_tpu.utils.platform import respect_jax_platforms_env
respect_jax_platforms_env()
import jax
import jax.numpy as jnp
from jax import lax

from prediff_tpu.models.layers import Conv3x3x3
from prediff_tpu.ops import pallas_conv3d

print("backend:", jax.default_backend(), flush=True)


def measure(tag, step_fn, x0, K):
    def chain(x):
        xf, _ = lax.scan(lambda c, _: (step_fn(c), None), x, None, length=K)
        return jnp.sum(xf)

    f = jax.jit(chain)
    _ = float(np.asarray(f(x0)))
    t0 = time.perf_counter()
    _ = float(np.asarray(f(x0)))
    dt = (time.perf_counter() - t0)
    print(f"{tag:34s} K={K:5d}: {dt/K*1e6:9.1f} us/iter  (total {dt*1e3:7.1f} ms)",
          flush=True)
    return dt


rs = np.random.RandomState(0)
for sname, (B, T, H, W, C) in [("stage0", (1, 13, 16, 16, 256)),
                               ("stage1", (1, 13, 8, 8, 512))]:
    x = jnp.asarray(rs.rand(B, T, H, W, C).astype(np.float32)) - 0.5
    kern = jnp.asarray(rs.rand(3, 3, 3, C, C).astype(np.float32)) * 0.03
    bias = jnp.asarray(rs.rand(C).astype(np.float32))
    conv = Conv3x3x3(features=C, impl="t2d")
    w0 = conv.init(jax.random.PRNGKey(0), x)
    convx = Conv3x3x3(features=C, impl="xla")

    t2d = lambda c: conv.apply(w0, c) * 1e-2
    xla = lambda c: convx.apply(w0, c) * 1e-2
    pal = lambda c: pallas_conv3d.fused_conv3x3x3(c, kern, bias) * 1e-2

    for tag, fn in [("t2d", t2d), ("pallas-gemm", pal)]:
        d250 = measure(f"{sname} {tag}", fn, x, 250)
        d1000 = measure(f"{sname} {tag}", fn, x, 1000)
        # fixed-overhead estimate: assumes linear scaling in K
        per = (d1000 - d250) / 750
        fixed = d250 - 250 * per
        print(f"  -> true {per*1e6:7.1f} us/iter, fixed {fixed*1e3:6.1f} ms/dispatch",
              flush=True)
print("probe53 done", flush=True)
