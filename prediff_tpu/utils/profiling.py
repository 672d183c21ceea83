"""Tracing / profiling helpers — the TPU equivalent of the reference's
optional Lightning PyTorchProfiler + grad-norm tracking (SURVEY.md §5).

Usage:
    with trace("/tmp/jax-trace"):            # view in TensorBoard / Perfetto
        train_step(...)

    timer = StepTimer()
    with timer:
        out = step(...); jax.block_until_ready(out)
    print(timer.summary())
"""
import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """jax.profiler trace scope; writes an xplane trace to ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock step timing with percentile summary."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "max_s": float(arr.max()),
            "steps_per_sec": float(1.0 / arr.mean()),
            "n": len(arr),
        }


def tree_grad_norms(grads) -> Dict[str, float]:
    """Per-leaf L2 norms (the reference's track_grad_norm equivalent)."""
    import jax

    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}{k}/")
        else:
            flat[prefix[:-1]] = float(np.sqrt(np.sum(np.square(np.asarray(tree)))))

    walk(jax.device_get(grads))
    return flat


def count_pallas_calls(fn, *args, **kwargs) -> Dict[str, int]:
    """Trace ``fn`` and count pallas_call equations per kernel name,
    recursing through scan/cond/custom-vjp sub-jaxprs.

    Driver-visible kernel-gate guard (VERDICT r3 #7): gate regressions that
    silently push kernels back to XLA (e.g. the round-3 f32-counted VMEM
    gate, probe62 — a 10% bench loss found only by a manual xplane hunt)
    change these counts, so bench.py asserts them and fails loudly."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args, **kwargs)
    # JAX's tracing cache reuses one jaxpr OBJECT for repeated calls of the
    # same jitted function, so sub-jaxprs must be counted with multiplicity
    # (each reference adds the sub-jaxpr's counts) — a plain visited-set
    # would collapse N identical call sites into 1 (found by the
    # test_count_pallas_calls_fingerprint unit test).  Memoize per object
    # id: jaxprs form a DAG, so each object is WALKED once but its counts
    # are ADDED once per reference.
    memo: Dict[int, Dict[str, int]] = {}

    def walk(jx) -> Dict[str, int]:
        hit = memo.get(id(jx))
        if hit is not None:
            return hit
        counts: Dict[str, int] = {}
        memo[id(jx)] = counts  # pre-bind; jaxprs cannot be cyclic
        for eqn in jx.eqns:
            if eqn.primitive.name == "pallas_call":
                name = str(eqn.params.get("name_and_src_info",
                                          eqn.params.get("name", "pallas")))
                name = name.split(" ")[0].split("@")[0]
                counts[name] = counts.get(name, 0) + 1
                continue  # don't recurse into the kernel body itself
            for v in eqn.params.values():
                for sub in _sub_jaxprs(v):
                    for k, n in walk(sub).items():
                        counts[k] = counts.get(k, 0) + n
        return counts

    def _sub_jaxprs(v):
        import jax.extend.core as jex_core

        if isinstance(v, jex_core.ClosedJaxpr):
            yield v.jaxpr
        elif isinstance(v, jex_core.Jaxpr):
            yield v
        elif isinstance(v, (list, tuple)):
            for item in v:
                yield from _sub_jaxprs(item)
        elif callable(getattr(v, "__wrapped__", None)):
            return

    return walk(jaxpr.jaxpr)
