"""Host->device input pipeline: background producer + double-buffered
device_put so HDF5/augmentation latency overlaps with TPU compute
(SURVEY.md §7 hard-part 5: host-side throughput feeding the mesh)."""
import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterable,
    size: int = 2,
    sharding=None,
    transform: Optional[Callable] = None,
) -> Iterator:
    """Yield device-resident batches, keeping up to ``size`` in flight.

    ``sharding``: optional jax.sharding.Sharding for jax.device_put (e.g.
    batch_sharding(mesh)); ``transform`` runs host-side in the producer
    thread (e.g. layout slicing)."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    error = []

    def producer():
        try:
            for item in iterator:
                if transform is not None:
                    item = transform(item)
                item = jax.device_put(item, sharding) if sharding is not None else (
                    jax.device_put(item)
                )
                q.put(item)
        except BaseException as e:  # re-raised in the consumer, not swallowed
            error.append(e)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error:
                raise error[0]
            break
        yield item
