"""Mixed-precision helpers.

On TPU, fp32 matmul/conv inputs already run through the MXU in (split)
bf16 by default; casting *weights* to bf16 additionally halves HBM weight
traffic — the dominant cost for small-batch inference.  Norm/log-variance
sensitive math (schedules, softmax accumulations) stays fp32 throughout the
framework, so weight-only bf16 is safe for sampling.

Usage:
    params_bf16 = cast_pytree(params, jnp.bfloat16)
    ld.sample(params_bf16["unet"], params_bf16["vae"], ...)
"""
from typing import Any

import jax
import jax.numpy as jnp


def cast_pytree(tree: Any, dtype, predicate=None) -> Any:
    """Cast every floating leaf to ``dtype`` (ints/bools untouched).
    ``predicate(path_leaf)`` may veto individual leaves."""

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def cast_to_bf16(tree: Any) -> Any:
    return cast_pytree(tree, jnp.bfloat16)


def cast_to_fp32(tree: Any) -> Any:
    return cast_pytree(tree, jnp.float32)
