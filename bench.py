"""Benchmark: the north-star metric - 10 s WAV -> SMPL-X motion, one chip.

Runs the full fused inference program (Kaldi fbank -> 3x AST -> 50-step
scan-DDIM -> VAE decode -> 6D->axis-angle) at flagship model sizes with
random weights (math/FLOPs identical to trained weights) and reports
wall-clock per 10 s window. BASELINE.md target: < 1 s / window / chip; the
reference has no published number (SURVEY §6), so vs_baseline is measured
against that 1 s budget (>1 means faster than target).

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params

    params = init_random_params(seed=0)
    pipe = GesturePipeline(params)

    rng = np.random.default_rng(0)
    n_windows = 1
    chunks = jnp.asarray(
        rng.normal(scale=0.05, size=(n_windows, 160000)).astype(np.float32)
    )
    key = jax.random.key(0)

    # compile + force a REAL device sync: through the remote-TPU tunnel,
    # block_until_ready returns at dispatch time, so wall-clock must be
    # bounded by a device->host transfer of the result.
    out = pipe.wav_to_motion(key, chunks)
    np.asarray(out[0])

    # timed: the device executes the queued programs serially, so forcing
    # only the final output bounds all iterations (one tunnel RTT amortised)
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipe.wav_to_motion(jax.random.key(i), chunks)
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / iters / n_windows

    target = 1.0  # seconds per 10 s window (BASELINE.md north star)
    print(
        json.dumps(
            {
                "metric": "wav_to_smplx_latency_10s_window",
                "value": round(dt * 1000.0, 3),
                "unit": "ms",
                "vs_baseline": round(target / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
