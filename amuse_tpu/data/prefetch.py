"""Host->device prefetching: overlap batch assembly with device compute.

The training host here is often a single CPU core (the TPU VM does the
work); without overlap the device idles while Python stacks the next batch.
``prefetch_to_device`` wraps any batch iterator with a background thread
that keeps ``size`` batches already transferred (and sharded) ahead of the
consumer - the JAX-native double-buffering pattern, complementing the C++
ABIN loader (amuse_tpu/native) that does the same for disk -> host.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax


def prefetch_to_device(
    iterator: Iterable,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Yield device-resident batches, staying ``size`` ahead of the consumer."""
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    err: list[BaseException] = []

    def put(batch):
        if sharding is not None:
            batch = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        else:
            batch = jax.tree.map(jax.device_put, batch)
        q.put(batch)

    def producer():
        try:
            for batch in iterator:
                put(batch)
        except BaseException as e:  # surface in the consumer thread
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item
