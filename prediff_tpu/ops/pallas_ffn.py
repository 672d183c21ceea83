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


def supports_shape(tokens: int, C: int, hidden: int) -> bool:
    return (
        C % 128 == 0
        and hidden % 128 == 0
        and pick_token_tile(tokens, hidden) is not None
    )


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
