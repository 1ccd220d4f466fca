"""Shared sync-then-time helper for the on-chip benchmarks.

Through the axon remote-TPU tunnel ``jax.block_until_ready`` returns at
DISPATCH time, so every timing loop must force a device->host transfer
(``np.asarray``) to actually synchronize. One warmup call (compile), then
``iters`` timed calls with a single trailing sync.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def _sync(r) -> None:
    # transfer ONE element of the first leaf: forces the computation without
    # pulling a potentially-huge tensor (e.g. a param tree) through the tunnel
    np.asarray(jax.tree.leaves(r)[0].ravel()[0:1])


def timeit_ms(fn, iters: int, *args) -> float:
    """Milliseconds per call of ``fn(*args)``, tunnel-synced."""
    _sync(fn(*args))  # warmup/compile
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / iters * 1e3
