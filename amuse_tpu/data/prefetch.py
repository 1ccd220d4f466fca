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
from typing import Iterable, Iterator

import jax


def prefetch_to_device(
    iterator: Iterable,
    size: int = 2,
    sharding=None,
) -> Iterator:
    """Yield device-resident batches, staying ``size`` ahead of the consumer.

    Abandonment-safe: if the consumer drops the generator mid-epoch (step
    exception, Ctrl-C), closing it sets a stop event; the producer's queue
    puts time out and re-check it, so the thread exits instead of parking
    forever in ``q.put`` with ``size`` sharded batches pinned in HBM.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    stop = threading.Event()
    err: list[BaseException] = []

    def put(batch):
        if sharding is not None:
            batch = jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        else:
            batch = jax.tree.map(jax.device_put, batch)
        while not stop.is_set():
            try:
                q.put(batch, timeout=0.5)
                return
            except queue.Full:
                continue

    def producer():
        try:
            for batch in iterator:
                if stop.is_set():
                    return
                put(batch)
        except BaseException as e:  # surface in the consumer thread
            err.append(e)
        finally:
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.5)
                    return
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()  # runs on generator close/GC too (GeneratorExit)
