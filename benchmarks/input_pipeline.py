"""Input-pipeline benchmark: Python mmap WindowCache vs native ABIN loader.

Measures host-side batch assembly throughput for the stage-2 training batch
(motion + con/emo/sty + labels, audio dropped) and the overlap behaviour
with a simulated device step. Decides the ``gesture.native_loader`` default;
numbers recorded in docs/PARITY.md.

Run: python benchmarks/input_pipeline.py [num_windows] [batch_size]
Prints one JSON line per pipeline.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))

TRAIN_FIELDS = ("motion", "actor_id", "emo_label", "con", "emo", "sty")


def make_cache(root: Path, n: int) -> Path:
    from amuse_tpu.data.cache import FIELDS, SHARD_WINDOWS

    rng = np.random.default_rng(0)
    cache = root / "cache"
    cache.mkdir()
    shards = []
    for s in range(0, n, SHARD_WINDOWS):
        m = min(SHARD_WINDOWS, n - s)
        d = cache / f"shard_{s // SHARD_WINDOWS:05d}"
        d.mkdir()
        np.save(d / "motion.npy", rng.normal(size=(m, 300, 168)).astype(np.float32))
        np.save(d / "actor_id.npy", rng.integers(0, 30, m).astype(np.int64))
        np.save(d / "emo_label.npy", rng.integers(0, 8, m).astype(np.int64))
        np.save(d / "audio.npy", rng.normal(size=(m, 16000)).astype(np.float32))
        np.save(d / "con.npy", rng.normal(size=(m, 256)).astype(np.float32))
        np.save(d / "emo.npy", rng.normal(size=(m, 256)).astype(np.float32))
        np.save(d / "sty.npy", rng.normal(size=(m, 256)).astype(np.float32))
        shards.append(d.name)
    (cache / "manifest.json").write_text(
        json.dumps({"num_windows": n, "shards": shards, "fields": list(FIELDS)})
    )
    return cache


def bench(epoch_iter_fn, epochs: int, step_ms: float = 0.0) -> float:
    """-> batches/sec over `epochs` epochs; step_ms simulates device time the
    loader could overlap. One warmup epoch first (page cache, thread spin-up)."""
    for _ in epoch_iter_fn(999):
        pass
    n_batches = 0
    t0 = time.perf_counter()
    for e in range(epochs):
        for batch in epoch_iter_fn(e):
            if step_ms:
                time.sleep(step_ms / 1000.0)
            n_batches += 1
    return n_batches / (time.perf_counter() - t0)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    with tempfile.TemporaryDirectory() as tmp:
        cache_dir = make_cache(Path(tmp), n)

        from amuse_tpu.data.cache import WindowCache
        from amuse_tpu.native import loader as nl

        wc = WindowCache(cache_dir)

        def python_epoch(e):
            rng = np.random.default_rng([0, e])
            yield from wc.batches(bsz, rng)

        for step_ms in (0.0, 5.0):
            r = bench(python_epoch, 3, step_ms)
            print(json.dumps({
                "pipeline": "python_mmap", "batches_per_sec": round(r, 1),
                "sim_step_ms": step_ms, "batch_size": bsz,
            }))

        if not nl.is_available():
            print(json.dumps({"pipeline": "native_abin", "error": "no g++"}))
            return
        abin = nl.cache_to_abin(cache_dir, Path(tmp) / "cache.abin", fields=TRAIN_FIELDS)
        ld = nl.NativeWindowLoader(abin)

        def native_epoch(e):
            yield from ld.epoch(bsz, seed=e)

        for step_ms in (0.0, 5.0):
            r = bench(native_epoch, 3, step_ms)
            print(json.dumps({
                "pipeline": "native_abin", "batches_per_sec": round(r, 1),
                "sim_step_ms": step_ms, "batch_size": bsz,
            }))


if __name__ == "__main__":
    main()
