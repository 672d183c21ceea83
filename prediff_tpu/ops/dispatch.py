"""Kernel dispatch policy: 'auto' flag resolution + VMEM budget gates.

``use_pallas_*`` config values may be True / False / "auto" (and "layer" /
"grouped" for attention).  'auto' means: use the fused Pallas path iff the
actual compute backend is a real TPU — resolved HERE, at trace time, not at
model-build time (advisor round-2: a model built while CPU was the default
backend silently kept kernels off after moving to TPU; now the decision is
made where ``interpret`` is already decided, so build-time backend state is
irrelevant).

VMEM budget: ~16 MB/core on current TPUs (pallas_guide.md).  Kernels that
hold whole weight matrices / (heads, R, R) scratch resident must gate on a
byte budget so oversized configs fall back to the XLA path instead of
failing at Mosaic compile time.
"""
import jax

# Leave headroom under the ~16 MB/core VMEM for Mosaic's own buffers and
# double-buffered pipeline blocks.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def resolve_auto(flag) -> bool:
    """'auto' -> fused kernels on real TPU backends only (CPU interpret mode
    is for correctness tests, not speed)."""
    if flag == "auto":
        return jax.default_backend() == "tpu"
    return bool(flag)


def resolve_auto_attn(flag):
    """'auto' -> whole-layer attention kernel on real TPUs (eligible layers
    only; ineligible ones fall back to the grouped kernel, then einsum)."""
    if flag == "auto":
        return "layer" if jax.default_backend() == "tpu" else False
    return flag
