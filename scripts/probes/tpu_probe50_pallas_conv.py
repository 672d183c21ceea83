"""Round-3 probe J: Pallas conv3x3x3 prototype for the B=1 sampling shapes.

probe48 showed the t2d 2-D convs run at only ~19 TF/s at B=1 (628 us for the
11.8 GFLOP stage-0 conv) — the (B*T,16,16,C) im2col matmuls are too small to
fill the MXU, and XLA's native 3-D conv is worse (9 TF/s at stage 1).  The
UNet's conv budget is ~2.3 ms of the 5.99 ms sampling step, so a fast conv
kernel is the biggest single headline lever left.

Kernel design (reshape-free): flatten the zero-PADDED volume to rows
(R = Tp*Hp*Wp, C) with C on lanes.  Output row r(t,h,w) = (t*Hp+h)*Wp+w
needs input row r + OFF(dt,dh,dw), OFF = (dt*Hp+dh)*Wp+dw in [0, OFFmax].
So with L = R - OFFmax, each of the 27 taps contributes one uniform
row-shifted dot:

    acc[0:L] += xp2[OFF : OFF+L] @ w[tap]          # (L,C)@(C,OCt), f32 acc

— static sublane slices, no reshapes, no gathers; bf16 MXU operands.  The
padded-space waste (R/THW ~ 1.46x at stage 0) is the price of perfectly
MXU-shaped dots.  Valid rows are extracted OUTSIDE the kernel by XLA
(slice of the (Tp,Hp,Wp,OC) reshape).

Measures correctness vs lax conv (CPU interpret) and TPU time vs t2d at
both sampling stages, fwd only (bwd is a separate step if fwd wins).
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import numpy as np
from prediff_tpu.utils.platform import respect_jax_platforms_env
respect_jax_platforms_env()
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from prediff_tpu.models.layers import Conv3x3x3

INTERPRET = jax.default_backend() != "tpu"
print("backend:", jax.default_backend(), "interpret:", INTERPRET, flush=True)


def _conv_kernel(xp_ref, w_ref, b_ref, o_ref, *, offs, row_tile):
    i = pl.program_id(0)
    base = i * row_tile
    acc = jnp.zeros((row_tile, w_ref.shape[2]), jnp.float32)
    for tap, off in enumerate(offs):
        xs = xp_ref[pl.ds(base + off, row_tile), :]
        acc = acc + jax.lax.dot(
            xs, w_ref[tap], preferred_element_type=jnp.float32
        )
    o_ref[...] = (acc + b_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


def pallas_conv3x3x3(x, kernel, bias, oc_tile=None, dot_dtype=jnp.bfloat16,
                     row_tile=1024):
    """x (B,T,H,W,C), kernel (3,3,3,C,OC), bias (OC,) -> (B,T,H,W,OC)."""
    B, T, H, W, C = x.shape
    OC = kernel.shape[-1]
    assert B == 1, "prototype: sampling path"
    Tp, Hp, Wp = T + 2, H + 2, W + 2
    R = Tp * Hp * Wp
    OFFmax = 2 * Hp * Wp + 2 * Wp + 2
    L = R - OFFmax
    offs = [(dt * Hp + dh) * Wp + dw
            for dt in range(3) for dh in range(3) for dw in range(3)]
    n_rows = -(-L // row_tile)  # ceil; xp padded so every slice is in bounds
    Rpad = n_rows * row_tile + OFFmax
    xp = jnp.pad(x[0], ((1, 1), (1, 1), (1, 1), (0, 0))).reshape(R, C)
    xp = jnp.pad(xp, ((0, Rpad - R), (0, 0))).astype(dot_dtype)
    w = kernel.reshape(27, C, OC).astype(dot_dtype)
    oc_tile = oc_tile or OC
    n = OC // oc_tile
    out = pl.pallas_call(
        functools.partial(_conv_kernel, offs=offs, row_tile=row_tile),
        grid=(n_rows, n),
        in_specs=[
            pl.BlockSpec((Rpad, C), lambda i, j: (0, 0)),
            pl.BlockSpec((27, C, oc_tile), lambda i, j: (0, 0, j)),
            pl.BlockSpec((1, oc_tile), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((row_tile, oc_tile), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n_rows * row_tile, OC), x.dtype),
        interpret=INTERPRET,
    )(xp, w, bias.reshape(1, OC))
    out = out[:L]
    # valid rows: r = (t*Hp + h)*Wp + w ; extract via padded reshape
    outp = jnp.concatenate(
        [out, jnp.zeros((R - L, OC), out.dtype)], axis=0
    ).reshape(Tp, Hp, Wp, OC)
    return outp[:T, :H, :W, :][None]


def timeit(tag, fn, *args, flops=None, K=50):
    jf = jax.jit(fn)
    _ = float(np.asarray(jf(*args)))
    t0 = time.perf_counter()
    _ = float(np.asarray(jf(*args)))
    dt = (time.perf_counter() - t0) / K
    extra = f"  {flops/dt/1e12:7.1f} TF/s" if flops else ""
    print(f"{tag:40s}: {dt*1e6:9.1f} us/iter{extra}", flush=True)
    return dt


from prediff_tpu.ops import pallas_conv3d

rs = np.random.RandomState(0)
SHAPES = [("stage0", (1, 13, 16, 16, 256)), ("stage1", (1, 13, 8, 8, 512)),
          ("stage0 B8", (8, 13, 16, 16, 256)), ("stage1 B8", (8, 13, 8, 8, 512))]
for sname, (B, T, H, W, C) in SHAPES:
    x = jnp.asarray(rs.rand(B, T, H, W, C).astype(np.float32)) - 0.5
    kern = jnp.asarray(rs.rand(3, 3, 3, C, C).astype(np.float32)) * 0.05
    bias = jnp.asarray(rs.rand(C).astype(np.float32))

    ref = pallas_conv3d.conv3x3x3_reference(x, kern, bias)
    got = pallas_conv3d.fused_conv3x3x3(x, kern, bias, interpret=INTERPRET)
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    print(f"{sname}: rel err vs lax (bf16 dots): {err:.2e}", flush=True)

    if not INTERPRET:
        CONV_FLOPS = 2 * 27 * B * T * H * W * C * C
        K = 50

        def chain_pallas(x, kern, bias):
            def step(c, _):
                return pallas_conv3d.fused_conv3x3x3(c, kern, bias) * 1e-2, None
            xf, _ = lax.scan(step, x, None, length=K)
            return jnp.sum(xf)

        conv = Conv3x3x3(features=C, impl="t2d")
        w0 = conv.init(jax.random.PRNGKey(0), x)

        def chain_t2d(x, w0):
            def step(c, _):
                return conv.apply(w0, c) * 1e-2, None
            xf, _ = lax.scan(step, x, None, length=K)
            return jnp.sum(xf)

        timeit(f"{sname} pallas fwd", chain_pallas, x, kern, bias,
               flops=CONV_FLOPS, K=K)
        timeit(f"{sname} t2d fwd", chain_t2d, x, w0, flops=CONV_FLOPS, K=K)
print("probe50 done", flush=True)
