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
    stop = threading.Event()

    def put(item) -> bool:
        """Enqueue unless the consumer has gone away (generator closed, e.g.
        a --max-steps break mid-epoch) — otherwise the producer would block
        forever holding ``size`` device-resident batches."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if transform is not None:
                    item = transform(item)
                item = jax.device_put(item, sharding) if sharding is not None else (
                    jax.device_put(item)
                )
                if not put(item):
                    return
        except BaseException as e:  # re-raised in the consumer, not swallowed
            error.append(e)
        finally:
            put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                break
            yield item
    finally:
        stop.set()  # runs on close()/GC of an abandoned generator too
        while not q.empty():  # release any device batches still queued
            try:
                q.get_nowait()
            except queue.Empty:
                break
