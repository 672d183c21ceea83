"""Knowledge alignment: classifier-guidance-style mean shift from a trained
energy model U(z_t, t, y).

Reference parity: SEVIRAvgIntensityAlignment
(src/prediff/diffusion/knowledge_alignment/sevir.py:7) and
get_sample_align_fn (alignment_pl.py:423).

TPU-first: the reference re-enters torch autograd inside its Python sampling
loop (`torch.enable_grad` + `autograd.grad`); here the guidance gradient is
plain ``jax.grad`` of the alignment energy wrt z_t, composed *inside* the
scanned sampling step and compiled once."""
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct



def avg_x_objective(x: jnp.ndarray) -> jnp.ndarray:
    """Per-frame mean intensity target: (B,T,H,W,C) -> (B,T,1) (ref sevir.py:41)."""
    return x.mean(axis=(2, 3, 4))[..., None]


@struct.dataclass
class KnowledgeAlignment:
    """Bundles the alignment model apply-fn, params and guidance scale.

    ``alignment_energy`` mirrors the reference ``alignment_fn`` (sevir.py:55):
    U's per-frame readout is averaged over T, then an L2 norm against the
    knowledge target ``avg_x_gt`` over ALL elements (batch included — the
    reference flattens across the batch too)."""

    params: Any
    guide_scale: float = struct.field(pytree_node=False, default=1.0)
    apply_fn: Callable = struct.field(pytree_node=False, default=None)
    alignment_type: str = struct.field(pytree_node=False, default="avg_x")
    # dtype for the guidance-shift computation.  'auto' = bfloat16 on real
    # TPUs; numerically safe (the shift is guide_scale * a normalized
    # gradient direction, and the scalar sqrt tail stays f32) but measured
    # slightly SLOWER in-chain than f32 (probe58: 130.6-131.3 vs 132.3-132.5
    # guided steps/s — the overhead is op sequencing, not HBM traffic), so
    # the factory default is 'float32'.
    compute_dtype: str = struct.field(pytree_node=False, default="float32")

    def _resolved_dtype(self):
        if self.compute_dtype == "auto":
            import jax as _jax

            return jnp.bfloat16 if _jax.default_backend() == "tpu" else jnp.float32
        return jnp.dtype(self.compute_dtype)

    def predict(self, zt, t, zc=None, y=None):
        return self.apply_fn({"params": self.params}, zt, t, zc=zc, y=y)

    def _sq_error(self, zt, t, avg_x_gt, zc=None, y=None):
        """This shard's summed squared error (pre-psum, pre-sqrt)."""
        pred = self.predict(zt, t, zc=zc, y=y)  # (B, T, 1)
        # the scalar tail stays f32 regardless of compute dtype (a bf16
        # sqrt-eps underflows and its gradient blows up at sq ~ 0)
        pred = pred.astype(jnp.float32).mean(axis=1)  # (B, 1)
        return jnp.sum(jnp.square(pred - avg_x_gt.astype(jnp.float32)))

    def alignment_energy(self, zt, t, avg_x_gt, zc=None, y=None,
                         axis_name=None):
        """When ``axis_name`` is given (shard_map-partitioned sampling), the
        squared error is psum'd across the mesh before the sqrt so the
        batch-coupled energy matches the unsharded computation exactly."""
        sq = self._sq_error(zt, t, avg_x_gt, zc=zc, y=y)
        if axis_name is not None:
            sq = jax.lax.psum(sq, axis_name)
        return jnp.sqrt(sq + 1e-24)

    def get_mean_shift(self, zt, t, avg_x_gt, zc=None, y=None, axis_name=None):
        """guide_scale * d(energy)/d(z_t), computed in-graph.

        Sharded case (round-5 fix, caught by dryrun_multichip's guided
        check): NEVER differentiate through the psum — under shard_map
        (check_vma=False) psum's transpose is psum, which inflates the
        gradient by the axis size (measured exactly 8x on an 8-device
        mesh).  Instead use the chain rule explicitly: with
        E = sqrt(psum(s_local) + eps),  dE/dz_local = (ds_local/dz_local)
        / (2 sqrt(psum(s_local) + eps)) — other shards' s depends only on
        their own z.  Bit-exact vs the unsharded gradient."""
        dtype = self._resolved_dtype()
        if dtype != zt.dtype:
            low = self.replace(
                params=jax.tree_util.tree_map(
                    lambda p: p.astype(dtype), self.params),
                compute_dtype=str(np.dtype(dtype)),
            )
            zc_l = None if zc is None else zc.astype(dtype)
            return self.guide_scale * low._shift_impl(
                zt.astype(dtype), t, avg_x_gt, zc_l, y, axis_name
            ).astype(zt.dtype)
        return self.guide_scale * self._shift_impl(
            zt, t, avg_x_gt, zc, y, axis_name)

    def _shift_impl(self, zt, t, avg_x_gt, zc, y, axis_name):
        # the SAME explicit chain-rule expression serves both paths, so the
        # sharded and unsharded programs are structurally identical and the
        # dryrun/test equality is bit-exact (op-order rounding aside, jax's
        # grad-of-sqrt would emit a different op sequence)
        sq_local, grad_sq = jax.value_and_grad(
            lambda z: self._sq_error(z, t, avg_x_gt, zc=zc, y=y)
        )(zt)
        sq_global = (jax.lax.psum(sq_local, axis_name)
                     if axis_name is not None else sq_local)
        return grad_sq / (2.0 * jnp.sqrt(sq_global + 1e-24))


def get_alignment_kwargs_avg_x(target_seq: jnp.ndarray, multiplier: float = 2.0) -> Dict[str, jnp.ndarray]:
    """Demonstration knowledge: 2x the ground-truth future mean intensity
    (ref: train_sevirlr_prediff.py:48-67)."""
    batch_size = target_seq.shape[0]
    ret = target_seq.reshape(batch_size, -1).mean(axis=1, keepdims=True) * multiplier
    return {"avg_x_gt": ret}
