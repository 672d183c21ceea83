"""Round-3 probe K: raw-matmul speed-of-light for the B=1 conv shapes.

probe50's pallas conv kernel hit the same ~18 TF/s as t2d at B=1 — so
either the 27 unaligned tap slices dominate (relayouts), or matmuls of this
size simply can't go faster on v5e.  Chain raw jnp.dot at the exact
candidate shapes (bf16 operands, f32 accum) and print achieved TF/s:

  - (848,256)@(256,256)        one pallas tap dot (27/grid-step)
  - (3328,2304)@(2304,256)     t2d's implicit im2col GEMM (one t-plane)
  - (3328,6912)@(6912,256)     full 3-D im2col GEMM (B=1 stage0)
  - (1280,512)@(512,512)       stage1-ish tap
  - (832,13824)@(13824,512)    full im2col stage1
  - (26624,2304)@(2304,256)    B=8 t2d scale (known-fast reference point)
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from prediff_tpu.utils.platform import respect_jax_platforms_env
respect_jax_platforms_env()
import jax
import jax.numpy as jnp
from jax import lax

print("backend:", jax.default_backend(), flush=True)
K = 200

SHAPES = [
    (848, 256, 256),
    (3328, 2304, 256),
    (3328, 6912, 256),
    (1280, 512, 512),
    (832, 13824, 512),
    (26624, 2304, 256),
]
rs = np.random.RandomState(0)
for M, Kd, N in SHAPES:
    a = jnp.asarray(rs.rand(M, Kd).astype(np.float32) - 0.5, jnp.bfloat16)
    b = jnp.asarray(rs.rand(Kd, N).astype(np.float32) * 0.05, jnp.bfloat16)
    flops = 2 * M * Kd * N

    def chain(a, b):
        def step(c, _):
            o = jax.lax.dot(c, b, preferred_element_type=jnp.float32)
            # keep carry shape (M,Kd): pad/crop N->Kd cheaply via slice+tile
            reps = -(-Kd // N)
            c2 = jnp.tile(o, (1, reps))[:, :Kd].astype(jnp.bfloat16) * 0.1
            return c2, None
        cf, _ = lax.scan(step, a, None, length=K)
        return jnp.sum(cf.astype(jnp.float32))

    f = jax.jit(chain)
    _ = float(np.asarray(f(a, b)))
    t0 = time.perf_counter()
    _ = float(np.asarray(f(a, b)))
    dt = (time.perf_counter() - t0) / K
    print(f"({M:6d},{Kd:6d})@({Kd:6d},{N:4d}): {dt*1e6:8.1f} us  "
          f"{flops/dt/1e12:7.1f} TF/s", flush=True)
print("probe51 done", flush=True)
