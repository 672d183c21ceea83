"""Round-2 probe: full v1 UNet forward in a 100-step scan, XLA native 3-D conv
vs the t2d temporal decomposition (ground truth for the Conv3x3x3 switch)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
import jax
import jax.numpy as jnp
import prediff_tpu.models.layers as L

N = 100
B = 1


def build(impl):
    L.DEFAULT_CONV3D_IMPL = impl
    from prediff_tpu.config import prediff_default_config
    from prediff_tpu.factory import build_unet
    cfg = prediff_default_config()
    unet = build_unet(cfg)
    rng = jax.random.PRNGKey(0)
    z = jnp.asarray(np.random.RandomState(0).randn(B, 6, 16, 16, 64).astype(np.float32))
    zc = jnp.asarray(np.random.RandomState(1).randn(B, 7, 16, 16, 64).astype(np.float32))
    t = jnp.zeros((B,), jnp.int32)
    params = jax.jit(unet.init)(rng, z, t, zc)["params"]
    return unet, params, z, t, zc


def bench(impl):
    unet, params, z, t, zc = build(impl)

    @jax.jit
    def loop(p, z, t, c):
        def body(carry, _):
            return unet.apply({"params": p}, carry, t, c), None
        z, _ = jax.lax.scan(body, z, None, length=N)
        return z

    print(f"compiling {impl}...", flush=True)
    out = loop(params, z, t, zc)
    warm = float(np.asarray(out, np.float32).sum())
    t0 = time.perf_counter()
    for i in range(3):
        out = loop(params, out, t, zc)
        s = float(np.asarray(out, np.float32).sum())
    dt = (time.perf_counter() - t0) / 3 / N
    print(f"{impl:5s}: {dt*1000:6.2f} ms/forward ({1/dt:6.1f} fwd/s) [chk {s:.3e}]",
          flush=True)


bench("xla")
bench("t2d")
