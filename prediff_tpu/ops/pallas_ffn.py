"""Fused transformer-FFN Pallas TPU kernel.

One kernel = LayerNorm + ffn_1 + activation + ffn_2 + residual for a tile of
tokens — the sequence the XLA path emits as ~8 separate HBM-round-tripping ops
per FFN (reference FFN: PositionwiseFFN, cuboid_transformer.py:93).  Round-2
profiling (scripts/probes/tpu_probe20/21) showed these FFNs are 1/3 of the
B=1 denoise step and run at 31-70 TF/s because XLA tiles the matmuls over the
leading T=13 axis; here tokens are flattened and tiled in 128-aligned rows,
the hidden activation lives only in VMEM, and the matmuls run at the MXU's
native bf16 rate (``mxu_dtype=bfloat16`` matches XLA's default f32 matmul
precision on TPU; pass float32 for bit-accurate comparisons).

The weights use constant index maps so Mosaic keeps them VMEM-resident across
the token-tile grid.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pragma: no cover - import guard mirrors pallas_attention.py
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


_SQRT_HALF = float(np.sqrt(0.5))


def _erf(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error ~4e-7 in f32).

    Mosaic has no erf lowering; this uses only exp/divide, and the error is
    ~5 orders of magnitude below the bf16 operand rounding of the surrounding
    matmuls.  Shared by kernel and reference so the interpret-mode tests are
    bit-exact."""
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-a * a)
    return jnp.where(x < 0.0, -y, y)


def _apply_activation(h, activation: str):
    if activation == "gelu":  # erf form (torch nn.GELU default; see _erf)
        return h * 0.5 * (1.0 + _erf(h * _SQRT_HALF))
    if activation == "relu":
        return jnp.maximum(h, 0.0)
    if activation == "leaky":
        return jnp.where(h >= 0.0, h, 0.1 * h)
    if activation == "silu":
        return h * jax.nn.sigmoid(h)
    raise NotImplementedError(f"fused FFN activation '{activation}'")


SUPPORTED_ACTIVATIONS = ("gelu", "relu", "leaky", "silu")

_INV_SQRT_2PI = float(1.0 / np.sqrt(2.0 * np.pi))


def _apply_activation_grad(h, activation: str):
    """d act(h) / dh, matching :func:`_apply_activation` exactly."""
    if activation == "gelu":
        cdf = 0.5 * (1.0 + _erf(h * _SQRT_HALF))
        pdf = jnp.exp(-0.5 * h * h) * _INV_SQRT_2PI
        return cdf + h * pdf
    if activation == "relu":
        return (h > 0.0).astype(h.dtype)
    if activation == "leaky":
        return jnp.where(h >= 0.0, 1.0, 0.1)
    if activation == "silu":
        s = jax.nn.sigmoid(h)
        return s * (1.0 + h * (1.0 - s))
    raise NotImplementedError(f"fused FFN activation '{activation}'")


def _ffn_kernel(
    x_ref,        # (TM, C)
    ln_scale_ref,  # (1, C)
    ln_bias_ref,   # (1, C)
    w1_ref,        # (C, Hdim)
    b1_ref,        # (1, Hdim)
    w2_ref,        # (Hdim, C)
    b2_ref,        # (1, C)
    o_ref,         # (TM, C)
    *, eps, activation, mxu_dtype,
):
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale_ref[0].astype(jnp.float32) + ln_bias_ref[0].astype(jnp.float32)
    h = jax.lax.dot(
        ln.astype(mxu_dtype), w1_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = _apply_activation(h, activation)
    out = jax.lax.dot(
        h.astype(mxu_dtype), w2_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    o_ref[...] = (x + out).astype(o_ref.dtype)


def pick_token_tile(tokens: int, hidden: int, max_bytes: int = 4 * 1024 * 1024) -> Optional[int]:
    """Largest row-tile that divides ``tokens``, is sublane-aligned (mult of 8)
    and keeps the fp32 hidden activation under ``max_bytes`` of VMEM."""
    cap = max(8, min(tokens, max_bytes // (4 * hidden)))
    for tm in range(cap - cap % 8, 7, -8):
        if tokens % tm == 0:
            return tm
    return None


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "mxu_dtype_name", "interpret"),
)
def fused_ffn(
    x: jnp.ndarray,          # (tokens, C)
    ln_scale: jnp.ndarray,   # (C,)
    ln_bias: jnp.ndarray,    # (C,)
    w1: jnp.ndarray,         # (C, hidden)
    b1: jnp.ndarray,         # (hidden,)
    w2: jnp.ndarray,         # (hidden, C)
    b2: jnp.ndarray,         # (C,)
    eps: float = 1e-5,
    activation: str = "gelu",
    mxu_dtype_name: str = "bfloat16",
    interpret: bool = False,
) -> jnp.ndarray:
    """x + ffn_2(act(ffn_1(LayerNorm(x)))) in one Pallas kernel.

    Requires C and hidden to be lane-aligned (multiples of 128) and tokens to
    admit an 8-aligned divisor tile (see :func:`pick_token_tile`); callers
    gate on :func:`supports_shape`.
    """
    tokens, C = x.shape
    hidden = w1.shape[1]
    tm = pick_token_tile(tokens, hidden)
    assert tm is not None and C % 128 == 0 and hidden % 128 == 0, (
        "caller must gate with supports_shape()"
    )
    grid = (tokens // tm,)
    mxu_dtype = jnp.dtype(mxu_dtype_name)
    kernel = functools.partial(
        _ffn_kernel, eps=eps, activation=activation, mxu_dtype=mxu_dtype
    )
    # 2-D (1, n) views of the vectors: TPU wants >=2-D, lane-minor tiles
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    flops = 2 * 2 * tokens * C * hidden
    return pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_ffn",
        in_specs=[
            pl.BlockSpec((tm, C), lambda i: (i, 0)),
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((hidden, C)), const2((1, C)),
        ],
        out_specs=pl.BlockSpec((tm, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w1.size + w2.size) * w1.dtype.itemsize,
            transcendentals=tokens * hidden,
        ),
        interpret=interpret,
    )(x, row(ln_scale), row(ln_bias), w1, row(b1), w2, row(b2))


def ffn_vmem_bytes(tm: int, C: int, hidden: int,
                   weight_bytes: int = 2) -> int:
    """Bytes resident in one grid cell: both weight matrices (constant index
    maps keep them in VMEM) at ``weight_bytes`` per element, vectors, the
    token tile in/out, and the f32 hidden activation.

    Weights stage at the dtype the caller passes (f32 params from the
    module; pre-casting to bf16 would risk the never-hoisted-out-of-while
    convert trap, CLAUDE.md).  The default ``weight_bytes=2`` is therefore a
    CALIBRATED SOFT THRESHOLD, not the literal footprint: Mosaic's real VMEM
    ceiling is ~100 MB and the v1 stage-1 shape (tokens 832, C 512, hidden
    2048; true f32 footprint ~13.5 MB) compiles and runs — counting weights
    f32 against the 12 MB soft budget had silently gated those 24 sampler
    FFNs back to XLA, a measured 158 -> 142 steps/s bench regression
    (probe62).  Callers wanting a literal-footprint gate can pass
    weight_bytes=4."""
    return (
        weight_bytes * 2 * C * hidden  # w1 + w2 resident
        + 4 * (hidden + 3 * C)         # b1, ln_scale/bias, b2
        + 4 * tm * (2 * C + hidden)    # x tile, out tile, f32 hidden act
    )


def supports_shape(tokens: int, C: int, hidden: int) -> bool:
    from .dispatch import VMEM_BUDGET_BYTES

    if C % 128 != 0 or hidden % 128 != 0:
        return False
    tm = pick_token_tile(tokens, hidden)
    # budget gate (advisor round-2): a config whose resident weights overflow
    # VMEM must fall back to XLA instead of failing at Mosaic compile time
    return tm is not None and ffn_vmem_bytes(tm, C, hidden) <= VMEM_BUDGET_BYTES


def _ffn_bwd_dx_kernel(
    x_ref,        # (TM, C)
    g_ref,        # (TM, C) output cotangent
    ln_scale_ref,  # (1, C)
    ln_bias_ref,   # (1, C)
    w1_ref,        # (C, Hdim)
    b1_ref,        # (1, Hdim)
    w2_ref,        # (Hdim, C)
    dx_ref,        # (TM, C)
    *, eps, activation, mxu_dtype,
):
    """dL/dx of y = x + ffn2(act(ffn1(LN(x)))) — flash-style: the forward
    intermediates are recomputed in VMEM from x, nothing is saved to HBM."""
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    gamma = ln_scale_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    sigma_inv = jax.lax.rsqrt(var + eps)
    nhat = (x - mu) * sigma_inv
    ln = nhat * gamma + ln_bias_ref[0].astype(jnp.float32)
    h = jax.lax.dot(
        ln.astype(mxu_dtype), w1_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    da = jax.lax.dot_general(  # g @ w2^T
        g.astype(mxu_dtype), w2_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dh = da * _apply_activation_grad(h, activation)
    dln = jax.lax.dot_general(  # dh @ w1^T
        dh.astype(mxu_dtype), w1_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dnhat = dln * gamma
    dx_ln = sigma_inv * (
        dnhat
        - jnp.mean(dnhat, axis=-1, keepdims=True)
        - nhat * jnp.mean(dnhat * nhat, axis=-1, keepdims=True)
    )
    dx_ref[...] = (g + dx_ln).astype(dx_ref.dtype)


def _ffn_bwd_full_kernel(
    x_ref,        # (TM, C)
    g_ref,        # (TM, C) output cotangent
    ln_scale_ref,  # (1, C)
    ln_bias_ref,   # (1, C)
    w1_ref,        # (C, Hdim)
    b1_ref,        # (1, Hdim)
    w2_ref,        # (Hdim, C)
    dx_ref,        # (TM, C)
    dgamma_ref,    # (1, C)  f32, accumulated across the sequential grid
    dbeta_ref,     # (1, C)
    dw1_ref,       # (C, Hdim)
    db1_ref,       # (1, Hdim)
    dw2_ref,       # (Hdim, C)
    db2_ref,       # (1, C)
    *, eps, activation, mxu_dtype,
):
    """dL/d(everything) of y = x + ffn2(act(ffn1(LN(x)))) in ONE kernel —
    the train-path backward (probe40c: the custom_vjp's XLA param-grad
    recompute made the kernels a net loss in dropout-0 training; computing
    the param grads from the already-recomputed VMEM intermediates replaces
    that whole XLA subgraph with two extra in-kernel GEMMs).  Parameter
    grads accumulate f32 into constant-index-map outputs over the
    (sequential) token-tile grid."""
    i = pl.program_id(0)
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    gamma = ln_scale_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    sigma_inv = jax.lax.rsqrt(var + eps)
    nhat = (x - mu) * sigma_inv
    ln = nhat * gamma + ln_bias_ref[0].astype(jnp.float32)
    h = jax.lax.dot(
        ln.astype(mxu_dtype), w1_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    a = _apply_activation(h, activation)
    da = jax.lax.dot_general(  # g @ w2^T
        g.astype(mxu_dtype), w2_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dh = da * _apply_activation_grad(h, activation)
    dln = jax.lax.dot_general(  # dh @ w1^T
        dh.astype(mxu_dtype), w1_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dnhat = dln * gamma
    dx_ln = sigma_inv * (
        dnhat
        - jnp.mean(dnhat, axis=-1, keepdims=True)
        - nhat * jnp.mean(dnhat * nhat, axis=-1, keepdims=True)
    )
    dx_ref[...] = (g + dx_ln).astype(dx_ref.dtype)

    # ---- parameter-grad tiles (contract over the token-tile axis) -------- #
    dw2_t = jax.lax.dot_general(  # a^T @ g -> (Hdim, C)
        a.astype(mxu_dtype), g.astype(mxu_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dw1_t = jax.lax.dot_general(  # ln^T @ dh -> (C, Hdim)
        ln.astype(mxu_dtype), dh.astype(mxu_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    db2_t = jnp.sum(g, axis=0, keepdims=True)
    db1_t = jnp.sum(dh, axis=0, keepdims=True)
    dgamma_t = jnp.sum(dln * nhat, axis=0, keepdims=True)
    dbeta_t = jnp.sum(dln, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw2_ref[...] = dw2_t
        dw1_ref[...] = dw1_t
        db2_ref[...] = db2_t
        db1_ref[...] = db1_t
        dgamma_ref[...] = dgamma_t
        dbeta_ref[...] = dbeta_t

    @pl.when(i > 0)
    def _():
        dw2_ref[...] += dw2_t
        dw1_ref[...] += dw1_t
        db2_ref[...] += db2_t
        db1_ref[...] += db1_t
        dgamma_ref[...] += dgamma_t
        dbeta_ref[...] += dbeta_t


# the all-grads backward carries f32 dw1/dw2 accumulators on top of the dx
# backward's live set, so (like pallas_resblock) it raises the per-kernel
# VMEM limit instead of squeezing under the default soft budget, and uses a
# smaller token tile
FULL_BWD_TILE_BYTES = 512 * 1024
FULL_BWD_VMEM_LIMIT = 64 * 1024 * 1024


def supports_full_bwd_shape(tokens: int, C: int, hidden: int) -> bool:
    """Gate for the all-grads backward: the dx backward's live set PLUS the
    f32 dw1/dw2 accumulators (and the extra a/dw tile temporaries) must fit
    75% of the raised per-kernel VMEM limit."""
    tm = pick_token_tile(tokens, hidden, max_bytes=FULL_BWD_TILE_BYTES)
    if tm is None or C % 128 or hidden % 128:
        return False
    bytes_ = 4 * (
        2 * C * hidden             # w1 + w2 resident (staged dtype f32)
        + 2 * C * hidden           # dw1 + dw2 f32 accumulators
        + hidden + 3 * C
        + tm * (8 * C + 7 * hidden)  # live tile temporaries incl. a, dw tiles
    )
    return bytes_ <= 0.75 * FULL_BWD_VMEM_LIMIT


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "mxu_dtype_name", "interpret"),
)
def fused_ffn_bwd_full(
    x, g, ln_scale, ln_bias, w1, b1, w2,
    eps: float = 1e-5, activation: str = "gelu",
    mxu_dtype_name: str = "bfloat16", interpret: bool = False,
):
    """One-kernel backward: (dx, dgamma, dbeta, dw1, db1, dw2, db2)."""
    tokens, C = x.shape
    hidden = w1.shape[1]
    tm = pick_token_tile(tokens, hidden, max_bytes=FULL_BWD_TILE_BYTES)
    assert tm is not None, "caller must gate with supports_full_bwd_shape()"
    kernel = functools.partial(
        _ffn_bwd_full_kernel, eps=eps, activation=activation,
        mxu_dtype=jnp.dtype(mxu_dtype_name),
    )
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    tile = pl.BlockSpec((tm, C), lambda i: (i, 0))
    f32 = jnp.float32
    dx, dgamma, dbeta, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid=(tokens // tm,),
        name="fused_ffn_bwd_full",
        in_specs=[
            tile, tile,
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((hidden, C)),
        ],
        out_specs=(
            tile,
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((hidden, C)), const2((1, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * tokens * C * hidden,
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + 2 * (w1.size + w2.size) * 4,
            transcendentals=2 * tokens * hidden,
        ),
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=FULL_BWD_VMEM_LIMIT)
            if pltpu is not None else None
        ),
        interpret=interpret,
    )(x, g, row(ln_scale), row(ln_bias), w1, row(b1), w2)
    return (
        dx,
        dgamma.reshape(-1).astype(ln_scale.dtype),
        dbeta.reshape(-1).astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(w2.dtype),
    )


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "mxu_dtype_name", "interpret"),
)
def fused_ffn_bwd_dx(
    x: jnp.ndarray,          # (tokens, C)
    g: jnp.ndarray,          # (tokens, C)
    ln_scale: jnp.ndarray,
    ln_bias: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    eps: float = 1e-5,
    activation: str = "gelu",
    mxu_dtype_name: str = "bfloat16",
    interpret: bool = False,
) -> jnp.ndarray:
    tokens, C = x.shape
    hidden = w1.shape[1]
    # much smaller tile than the forward: the backward keeps ~5 (tm, hidden)
    # f32 temporaries live at once (h, act', da, dh + bf16 staging); Mosaic's
    # scoped-vmem stack is 16 MB (measured OOM at the 2 MB tile budget)
    tm = pick_token_tile(tokens, hidden, max_bytes=1024 * 1024)
    assert tm is not None and C % 128 == 0 and hidden % 128 == 0, (
        "caller must gate with supports_shape()/supports_bwd_shape()"
    )
    grid = (tokens // tm,)
    kernel = functools.partial(
        _ffn_bwd_dx_kernel, eps=eps, activation=activation,
        mxu_dtype=jnp.dtype(mxu_dtype_name),
    )
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    tile = pl.BlockSpec((tm, C), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        name="fused_ffn_bwd_dx",
        in_specs=[
            tile, tile,
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((hidden, C)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * tokens * C * hidden,
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + (w1.size + w2.size) * w1.dtype.itemsize,
            transcendentals=tokens * hidden,
        ),
        interpret=interpret,
    )(x, g, row(ln_scale), row(ln_bias), w1, row(b1), w2)


# ---------------------------------------------------------------------- #
# In-kernel PRNG dropout (round-4, VERDICT r3 #2): serves the v1
# dropout-0.1 recipe with the fused kernels.  The forward and the one-kernel
# backward seed pltpu's per-core PRNG identically — (seed words, tile index)
# — and draw bits in the same order over the SAME tile grid, so the backward
# applies exactly the forward's masks without materializing them in HBM.
# Draw-for-draw NOTE: the masks come from the TPU hardware PRNG stream, NOT
# from flax Dropout's threefry draws — a kernels-on training run takes a
# different (equally valid) dropout trajectory than the XLA path.  No
# interpret-mode lowering exists for pltpu.prng_*, so numerical tests are
# TPU-side probes (scripts/probes/tpu_probe67_kernel_dropout.py).
# ---------------------------------------------------------------------- #


def _keep_mask(shape, rate: float):
    """Bernoulli(1-rate) keep mask drawn from the seeded kernel PRNG."""
    bits = pltpu.prng_random_bits(shape)
    bits = jax.lax.bitcast_convert_type(bits, jnp.uint32)
    thr = np.uint32(min(int(round(rate * 2.0**32)), 2**32 - 1))
    return (bits >= thr).astype(jnp.float32)


def seed_prng(seed_ref, idx):
    """Seed the per-core PRNG from the two seed words + a grid-cell index.

    Mosaic on current libtpu rejects ``prng_seed`` with >2 values
    ("Setting seed with more than 2 values is not supported" — found by
    probe68 on the real chip; the 3-arg form traces fine and even compiles
    in some toolchains), so the cell index is MIXED into the words instead:
    odd-constant multiply + xor (splitmix-style) keeps distinct cells on
    distinct streams.  int32 arithmetic wraps, which is exactly what we
    want.  Forward and backward must pass the SAME (seed_ref, idx)."""
    idx = idx.astype(jnp.int32) if hasattr(idx, "astype") else jnp.int32(idx)
    h = (idx + jnp.int32(1)) * jnp.int32(-1640531527)  # 0x9E3779B9
    pltpu.prng_seed(seed_ref[0] ^ h, seed_ref[1] + (h << 1 | jnp.int32(1)))


def _ffn_dropout_fwd_kernel(
    seed_ref,      # (2,) int32 SMEM
    x_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    *, eps, activation, mxu_dtype, rate_act, rate_out,
):
    seed_prng(seed_ref, pl.program_id(0))
    x = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale_ref[0].astype(jnp.float32) + ln_bias_ref[0].astype(jnp.float32)
    z = jax.lax.dot(
        ln.astype(mxu_dtype), w1_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    a = _apply_activation(z, activation)
    if rate_act > 0.0:
        a = a * _keep_mask(a.shape, rate_act) / (1.0 - rate_act)
    out = jax.lax.dot(
        a.astype(mxu_dtype), w2_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    ) + b2_ref[0].astype(jnp.float32)
    if rate_out > 0.0:
        out = out * _keep_mask(out.shape, rate_out) / (1.0 - rate_out)
    o_ref[...] = (x + out).astype(o_ref.dtype)


def _ffn_dropout_bwd_full_kernel(
    seed_ref,      # (2,) int32 SMEM — same words as the forward
    x_ref, g_ref, ln_scale_ref, ln_bias_ref, w1_ref, b1_ref, w2_ref,
    dx_ref, dgamma_ref, dbeta_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, eps, activation, mxu_dtype, rate_act, rate_out,
):
    """All-grads backward regenerating the forward's dropout masks: same
    seed, same tile grid, same draw order.  Both masks are drawn UPFRONT in
    the forward's order (m1 over the hidden activation, then m2 over the
    output) — the PRNG stream advances per draw, so upfront draws of the
    same shapes yield bit-identical masks."""
    i = pl.program_id(0)
    seed_prng(seed_ref, i)
    hidden = w1_ref.shape[1]
    tm, C = x_ref.shape
    m1 = _keep_mask((tm, hidden), rate_act) if rate_act > 0.0 else None
    m2 = _keep_mask((tm, C), rate_out) if rate_out > 0.0 else None
    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    gamma = ln_scale_ref[0].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    sigma_inv = jax.lax.rsqrt(var + eps)
    nhat = (x - mu) * sigma_inv
    ln = nhat * gamma + ln_bias_ref[0].astype(jnp.float32)
    z = jax.lax.dot(
        ln.astype(mxu_dtype), w1_ref[...].astype(mxu_dtype),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    a = _apply_activation(z, activation)
    if m1 is not None:
        a = a * m1 / (1.0 - rate_act)
    # cotangent of `out` before its dropout
    do = g if m2 is None else g * m2 / (1.0 - rate_out)
    da = jax.lax.dot_general(  # do @ w2^T
        do.astype(mxu_dtype), w2_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dz = da * _apply_activation_grad(z, activation)
    if m1 is not None:
        dz = dz * m1 / (1.0 - rate_act)
    dln = jax.lax.dot_general(  # dz @ w1^T
        dz.astype(mxu_dtype), w1_ref[...].astype(mxu_dtype),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dnhat = dln * gamma
    dx_ln = sigma_inv * (
        dnhat
        - jnp.mean(dnhat, axis=-1, keepdims=True)
        - nhat * jnp.mean(dnhat * nhat, axis=-1, keepdims=True)
    )
    dx_ref[...] = (g + dx_ln).astype(dx_ref.dtype)

    dw2_t = jax.lax.dot_general(  # a^T @ do
        a.astype(mxu_dtype), do.astype(mxu_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    dw1_t = jax.lax.dot_general(  # ln^T @ dz
        ln.astype(mxu_dtype), dz.astype(mxu_dtype),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    db2_t = jnp.sum(do, axis=0, keepdims=True)
    db1_t = jnp.sum(dz, axis=0, keepdims=True)
    dgamma_t = jnp.sum(dln * nhat, axis=0, keepdims=True)
    dbeta_t = jnp.sum(dln, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        dw2_ref[...] = dw2_t
        dw1_ref[...] = dw1_t
        db2_ref[...] = db2_t
        db1_ref[...] = db1_t
        dgamma_ref[...] = dgamma_t
        dbeta_ref[...] = dbeta_t

    @pl.when(i > 0)
    def _():
        dw2_ref[...] += dw2_t
        dw1_ref[...] += dw1_t
        db2_ref[...] += db2_t
        db1_ref[...] += db1_t
        dgamma_ref[...] += dgamma_t
        dbeta_ref[...] += dbeta_t


def supports_dropout_shape(tokens: int, C: int, hidden: int) -> bool:
    """Gate for the dropout kernels: forward AND backward share the full-bwd
    tile (so their PRNG streams align), and pltpu.prng_* needs a real TPU."""
    return (
        _HAS_PLTPU
        and jax.default_backend() == "tpu"
        and supports_full_bwd_shape(tokens, C, hidden)
    )


def _seed_words(seed: jnp.ndarray) -> jnp.ndarray:
    """Fold an rng key's raw data (2 words threefry / 4 words rbg) into the
    (2,) int32 the kernels seed with."""
    kd = seed.reshape(-1).astype(jnp.uint32)
    s0, s1 = kd[0], kd[-1]
    if kd.shape[0] > 2:
        s0 = s0 ^ kd[1]
        s1 = s1 ^ kd[-2]
    return jnp.stack([s0, s1]).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "rate_act", "rate_out",
                     "mxu_dtype_name"),
)
def fused_ffn_dropout(
    x, seed, ln_scale, ln_bias, w1, b1, w2, b2,
    eps: float = 1e-5, activation: str = "gelu",
    rate_act: float = 0.0, rate_out: float = 0.0,
    mxu_dtype_name: str = "bfloat16",
):
    """Fused FFN with in-kernel PRNG dropout (train path, real TPU only)."""
    tokens, C = x.shape
    hidden = w1.shape[1]
    tm = pick_token_tile(tokens, hidden, max_bytes=FULL_BWD_TILE_BYTES)
    assert tm is not None, "caller must gate with supports_dropout_shape()"
    kernel = functools.partial(
        _ffn_dropout_fwd_kernel, eps=eps, activation=activation,
        mxu_dtype=jnp.dtype(mxu_dtype_name), rate_act=rate_act,
        rate_out=rate_out,
    )
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    tile = pl.BlockSpec((tm, C), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(tokens // tm,),
        name="fused_ffn_dropout",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile,
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((hidden, C)), const2((1, C)),
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * tokens * C * hidden,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w1.size + w2.size) * w1.dtype.itemsize,
            transcendentals=2 * tokens * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=FULL_BWD_VMEM_LIMIT),
    )(_seed_words(seed), x, row(ln_scale), row(ln_bias), w1, row(b1), w2,
      row(b2))


@functools.partial(
    jax.jit,
    static_argnames=("eps", "activation", "rate_act", "rate_out",
                     "mxu_dtype_name"),
)
def fused_ffn_dropout_bwd_full(
    x, g, seed, ln_scale, ln_bias, w1, b1, w2,
    eps: float = 1e-5, activation: str = "gelu",
    rate_act: float = 0.0, rate_out: float = 0.0,
    mxu_dtype_name: str = "bfloat16",
):
    """One-kernel all-grads backward with the forward's dropout masks
    regenerated from the same seed."""
    tokens, C = x.shape
    hidden = w1.shape[1]
    tm = pick_token_tile(tokens, hidden, max_bytes=FULL_BWD_TILE_BYTES)
    assert tm is not None, "caller must gate with supports_dropout_shape()"
    kernel = functools.partial(
        _ffn_dropout_bwd_full_kernel, eps=eps, activation=activation,
        mxu_dtype=jnp.dtype(mxu_dtype_name), rate_act=rate_act,
        rate_out=rate_out,
    )
    row = lambda v: v.reshape(1, -1)  # noqa: E731
    const2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0))  # noqa: E731
    tile = pl.BlockSpec((tm, C), lambda i: (i, 0))
    f32 = jnp.float32
    dx, dgamma, dbeta, dw1, db1, dw2, db2 = pl.pallas_call(
        kernel,
        grid=(tokens // tm,),
        name="fused_ffn_dropout_bwd_full",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile, tile,
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((hidden, C)),
        ],
        out_specs=(
            tile,
            const2((1, C)), const2((1, C)),
            const2((C, hidden)), const2((1, hidden)),
            const2((hidden, C)), const2((1, C)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
            jax.ShapeDtypeStruct((C, hidden), f32),
            jax.ShapeDtypeStruct((1, hidden), f32),
            jax.ShapeDtypeStruct((hidden, C), f32),
            jax.ShapeDtypeStruct((1, C), f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * tokens * C * hidden,
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + 2 * (w1.size + w2.size) * 4,
            transcendentals=2 * tokens * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=FULL_BWD_VMEM_LIMIT),
    )(_seed_words(seed), x, g, row(ln_scale), row(ln_bias), w1, row(b1), w2)
    return (
        dx,
        dgamma.reshape(-1).astype(ln_scale.dtype),
        dbeta.reshape(-1).astype(ln_bias.dtype),
        dw1.astype(w1.dtype),
        db1.reshape(-1).astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(-1).astype(w2.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def fused_ffn_dropout_diff(x, seed, ln_scale, ln_bias, w1, b1, w2, b2,
                           eps=1e-5, activation="gelu",
                           rate_act=0.0, rate_out=0.0,
                           mxu_dtype_name="bfloat16"):
    """Differentiable fused FFN with in-kernel PRNG dropout (round-4,
    VERDICT r3 #2): forward = one Pallas kernel incl. both dropout masks;
    backward = ONE Pallas kernel computing dx + every parameter grad with
    the identical masks regenerated from ``seed``.  Real-TPU only (callers
    gate with supports_dropout_shape); bf16 MXU operands by default.
    (NOTE: the axon terminal compiles with --xla_allow_excess_precision=true,
    under which the f32 and bf16 variants produce bit-identical results —
    probe67 debugging; the knob is kept for toolchains where it matters.)"""
    return fused_ffn_dropout(x, seed, ln_scale, ln_bias, w1, b1, w2, b2,
                             eps=eps, activation=activation,
                             rate_act=rate_act, rate_out=rate_out,
                             mxu_dtype_name=mxu_dtype_name)


def _ffn_dropout_diff_fwd(x, seed, ln_scale, ln_bias, w1, b1, w2, b2,
                          eps, activation, rate_act, rate_out,
                          mxu_dtype_name):
    out = fused_ffn_dropout(x, seed, ln_scale, ln_bias, w1, b1, w2, b2,
                            eps=eps, activation=activation,
                            rate_act=rate_act, rate_out=rate_out,
                            mxu_dtype_name=mxu_dtype_name)
    return out, (x, seed, ln_scale, ln_bias, w1, b1, w2, b2)


def _ffn_dropout_diff_bwd(eps, activation, rate_act, rate_out,
                          mxu_dtype_name, res, g):
    x, seed, ln_scale, ln_bias, w1, b1, w2, b2 = res
    dx, d_gamma, d_beta, dw1, db1, dw2, db2 = fused_ffn_dropout_bwd_full(
        x, g, seed, ln_scale, ln_bias, w1, b1, w2, eps=eps,
        activation=activation, rate_act=rate_act, rate_out=rate_out,
        mxu_dtype_name=mxu_dtype_name,
    )
    return (dx, None, d_gamma, d_beta, dw1, db1, dw2,
            db2.astype(b2.dtype))


fused_ffn_dropout_diff.defvjp(_ffn_dropout_diff_fwd, _ffn_dropout_diff_bwd)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11)
)
def fused_ffn_diff(x, ln_scale, ln_bias, w1, b1, w2, b2,
                   eps=1e-5, activation="gelu", mxu_dtype_name="bfloat16",
                   interpret=False, full_bwd=False):
    """Differentiable fused FFN (round-3): forward = the fused Pallas kernel;
    backward = fused Pallas dx kernel + XLA-recomputed parameter grads, OR —
    with ``full_bwd`` (the TRAIN path, where parameter grads are known to be
    consumed) — ONE Pallas kernel computing dx and every parameter grad.

    ``full_bwd=False`` keeps the dx-only backward whose XLA param-grad
    recompute is DCE'd entirely under input-only differentiation (guidance,
    ref alignment_pl.py:423) — a full kernel there would compute dw1/dw2 that
    nothing consumes, since XLA cannot dead-code-eliminate individual
    pallas_call outputs."""
    return fused_ffn(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps,
                     activation=activation, mxu_dtype_name=mxu_dtype_name,
                     interpret=interpret)


def _fused_ffn_diff_fwd(x, ln_scale, ln_bias, w1, b1, w2, b2,
                        eps, activation, mxu_dtype_name, interpret, full_bwd):
    out = fused_ffn(x, ln_scale, ln_bias, w1, b1, w2, b2, eps=eps,
                    activation=activation, mxu_dtype_name=mxu_dtype_name,
                    interpret=interpret)
    return out, (x, ln_scale, ln_bias, w1, b1, w2, b2)


def supports_bwd_shape(tokens: int, C: int, hidden: int) -> bool:
    """Gate for the Pallas dx-backward: both resident weights PLUS ~5
    live (tm, hidden) and ~7 (tm, C) f32 temporaries must fit the scoped
    VMEM budget (Mosaic stack, measured)."""
    from .dispatch import VMEM_BUDGET_BYTES

    tm = pick_token_tile(tokens, hidden, max_bytes=1024 * 1024)
    if tm is None:
        return False
    bytes_ = 4 * (
        2 * C * hidden             # w1 + w2 resident
        + hidden + 3 * C
        + tm * (7 * C + 5 * hidden)  # live tile temporaries (see bwd kernel)
    )
    return bytes_ <= VMEM_BUDGET_BYTES


def _fused_ffn_diff_bwd(eps, activation, mxu_dtype_name, interpret, full_bwd,
                        res, g):
    x, ln_scale, ln_bias, w1, b1, w2, b2 = res
    if full_bwd and supports_full_bwd_shape(x.shape[0], x.shape[1],
                                            w1.shape[1]):
        dx, d_gamma, d_beta, dw1, db1, dw2, db2 = fused_ffn_bwd_full(
            x, g, ln_scale, ln_bias, w1, b1, w2, eps=eps,
            activation=activation, mxu_dtype_name=mxu_dtype_name,
            interpret=interpret,
        )
        return dx, d_gamma, d_beta, dw1, db1, dw2, db2.astype(b2.dtype)
    if supports_bwd_shape(x.shape[0], x.shape[1], w1.shape[1]):
        dx = fused_ffn_bwd_dx(
            x, g, ln_scale, ln_bias, w1, b1, w2, eps=eps,
            activation=activation, mxu_dtype_name=mxu_dtype_name,
            interpret=interpret,
        )
    else:
        # dx via XLA recompute when the fused backward would overflow VMEM
        _, vjp_x = jax.vjp(
            lambda xx: fused_ffn_reference(
                xx, ln_scale, ln_bias, w1, b1, w2,
                jnp.zeros((w2.shape[1],), x.dtype),
                eps=eps, activation=activation,
            ),
            x,
        )
        (dx,) = vjp_x(g)
    # parameter grads: XLA recompute (DCE'd entirely under input-only grads);
    # b2 is an additive constant so its value is irrelevant to any gradient
    _, vjp = jax.vjp(
        lambda gam, bet, a1, c1, a2: fused_ffn_reference(
            x, gam, bet, a1, c1, a2, jnp.zeros((w2.shape[1],), x.dtype),
            eps=eps, activation=activation,
        ),
        ln_scale, ln_bias, w1, b1, w2,
    )
    d_gamma, d_beta, dw1, db1, dw2 = vjp(g)
    db2 = jnp.sum(g.astype(jnp.float32), axis=0).astype(b2.dtype)
    return dx, d_gamma, d_beta, dw1, db1, dw2, db2


fused_ffn_diff.defvjp(_fused_ffn_diff_fwd, _fused_ffn_diff_bwd)


def fused_ffn_reference(x, ln_scale, ln_bias, w1, b1, w2, b2,
                        eps=1e-5, activation="gelu"):
    """Pure-jnp reference with identical f32 semantics (for tests)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    ln = ln * ln_scale + ln_bias
    h = _apply_activation(ln @ w1 + b1, activation)
    return (xf + (h @ w2 + b2)).astype(x.dtype)
