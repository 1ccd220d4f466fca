"""Standalone probe for the driver bench key ``ddim50_sample_ms_b32``.

Reproduces bench.py's denoiser-sampling leg exactly (same model config,
same batch, same timing discipline) so chip-session variance and code
regressions can be separated: run it several times in fresh processes and
compare the spread against the committed BENCH_r0N numbers.

Usage: python benchmarks/ddim_probe.py [--iters 10] [--reps 5]
Prints one JSON line per rep plus a summary.
"""

from __future__ import annotations

import argparse
import json
import time


def measure(iters: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from amuse_tpu.diffusion.sampler import ddim_sample
    from amuse_tpu.diffusion.schedulers import make_schedule
    from amuse_tpu.models.denoiser import Denoiser, DenoiserConfig

    cfg = DenoiserConfig()
    model = Denoiser(cfg)
    b = 32
    cond = jnp.zeros((b, cfg.cond_dim))
    params = model.init(
        jax.random.key(0),
        jnp.zeros((b, cfg.latent_tokens, cfg.latent_dim)),
        jnp.zeros((b,), jnp.int32),
        cond, cond, cond,
    )["params"]
    schedule = make_schedule()

    @jax.jit
    def sample(key):
        def denoise(latents, t):
            tt = jnp.full((b,), t, jnp.int32)
            return model.apply({"params": params}, latents, tt, cond, cond, cond)

        return ddim_sample(
            schedule, denoise, key, (b, cfg.latent_tokens, cfg.latent_dim)
        )

    # warm up + compile
    r = sample(jax.random.key(0))
    np.asarray(r[0, 0, 0])
    t0 = time.perf_counter()
    for i in range(iters):
        r = sample(jax.random.key(i))
    np.asarray(r[0, 0, 0])
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    vals = []
    for rep in range(args.reps):
        dt = measure(args.iters) * 1000
        vals.append(dt)
        print(json.dumps({"rep": rep, "ddim50_sample_ms_b32": round(dt, 3)}))
    vals.sort()
    print(json.dumps({
        "min": round(vals[0], 3),
        "median": round(vals[len(vals) // 2], 3),
        "max": round(vals[-1], 3),
    }))


if __name__ == "__main__":
    main()
