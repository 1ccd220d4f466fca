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


def timed_best(run, sync, iters: int = 20, reps: int = 3):
    """Best-of-``reps`` mean-of-``iters`` SECONDS per call - the robust
    discipline for driver-facing numbers.

    The tunnel's per-sync round trip is LARGE (tens of ms) and BURSTY:
    measured on this chip (benchmarks/ddim_probe.py), the same compiled
    50-step DDIM program reads 6.6-11.4 ms/iter as mean-of-10-queued-
    iterations but a tight 4.14-4.20 ms/iter at 50 queued iterations. At
    small iteration counts the overhead leaks up to ~70% into the quoted
    number and its variance masquerades as regressions (the round-4
    ddim50 9.03-vs-6.70 ms "regression" was exactly this). Tunnel overhead
    is strictly additive, so min-of-reps estimates true device throughput.

    run(i) queues one program (result threaded forward), sync(result)
    forces a device->host transfer. Returns (best_s, spread) with spread =
    worst_rep/best_rep (1.0 = perfectly stable; report it next to the
    number).
    """
    r = run(0)
    sync(r)  # warmup/compile outside the timed region
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for i in range(iters):
            r = run(i)
        sync(r)
        vals.append((time.perf_counter() - t0) / iters)
    best = min(vals)
    return best, (max(vals) / best if best > 0 else float("inf"))
