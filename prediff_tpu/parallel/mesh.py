"""Device mesh + sharding utilities — the TPU-native equivalent of the
reference's Lightning DDP strategy (SURVEY.md §2.5).

The reference's only parallelism is data-parallel (DDPStrategy over NCCL,
train_sevirlr_prediff.py:648).  Here the same strategy is a 1-D ``data`` mesh:
params replicated, batch (and ensemble members) sharded on ``data``, gradient
all-reduce inserted by XLA from the sharding annotations — no explicit
collectives or process groups.  Multi-host: ``jax.distributed.initialize()``
then the same code; per-host input sharding via :func:`local_batch_slice`
(mirrors SEVIRDataLoader num_shard/rank, sevir_dataloader.py:329-358).
"""
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize JAX's multi-process runtime (the DDP process-group
    equivalent, ref train_sevirlr_prediff.py:648 DDPStrategy/NCCL).

    Call once per process before any mesh/device use on a multi-host pod.
    With no arguments JAX auto-detects the coordinator from the TPU pod
    metadata / standard cluster env vars (``jax.distributed.initialize()``
    no-arg form); explicit args cover bring-your-own-cluster setups.
    Returns True if the distributed runtime was (already) initialized.
    Safe to call in single-process runs: initialization errors from having
    no cluster are caught and reported False.
    """
    try:
        if jax._src.distributed.global_state.client is not None:  # already up
            return True
    except Exception:
        pass
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except Exception as e:  # single-process / no cluster metadata
        import warnings

        warnings.warn(f"jax.distributed.initialize failed ({e}); "
                      "continuing single-process")
        return False


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_data_mesh(batch_size: int, devices: Optional[Sequence] = None,
                   axis_name: str = "data") -> Mesh:
    """Data mesh over the largest device count that divides ``batch_size``
    (a 2-sample micro-batch on an 8-device host uses 2 devices rather than
    failing)."""
    devices = list(devices) if devices is not None else jax.devices()
    k = len(devices)
    while k > 1 and batch_size % k != 0:
        k -= 1
    return Mesh(np.asarray(devices[:k]), (axis_name,))


def make_2d_mesh(data: int, model: int, devices: Optional[Sequence] = None) -> Mesh:
    """(data, model) mesh for optional tensor-sharded variants."""
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) == data * model, (len(devices), data, model)
    return Mesh(np.asarray(devices).reshape(data, model), ("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis."""
    return NamedSharding(mesh, P(axis_name))


def chunk_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard axis 1 of a (K, B, ...) stacked-batch chunk (the scan axis K is
    replicated; see DiffusionTrainer.make_train_step_scan)."""
    return NamedSharding(mesh, P(None, axis_name))


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated on the mesh."""
    s = replicated_sharding(mesh)
    return jax.device_put(tree, s)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Shard every leaf's leading axis across ``axis_name``."""
    s = batch_sharding(mesh, axis_name)
    return jax.device_put(batch, s)


def local_batch_slice(global_batch_size: int, num_shards: Optional[int] = None,
                      shard_id: Optional[int] = None) -> slice:
    """Index range of this host's shard of a global batch (multi-host input
    pipeline; equivalent to the reference's num_shard/rank split)."""
    num_shards = num_shards if num_shards is not None else jax.process_count()
    shard_id = shard_id if shard_id is not None else jax.process_index()
    assert global_batch_size % num_shards == 0, (global_batch_size, num_shards)
    per = global_batch_size // num_shards
    return slice(shard_id * per, (shard_id + 1) * per)
