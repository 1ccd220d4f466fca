"""LPDM (stage-2) train-step benchmark on the real chip.

Flagship configuration: batch 32 windows x 300 frames x 168 feats with the
full 50-step DDIM monitor pass. Reference point: the upstream run needed an
A100-40G/V100-32G for this step (reference README.md:72-75).

The SMPL-X vertex-displacement monitor is opt-in (--vtex): at full body
scale (10475 vertices, random template - FLOPs identical to the released
model) it adds a (B*300, 10475, 3) LBS forward per step, which dominates
everything else; the CLI also disables it when no body npz is present
(amuse_tpu/cli/main.py:253-256).

Usage: python benchmarks/train_steps.py [--no-monitor] [--vtex] [--iters N]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

try:
    from _timing import timed_best
except ImportError:
    from benchmarks._timing import timed_best

from amuse_tpu.core import smplx as smplx_mod
from amuse_tpu.train.gesture import GestureTrainConfig, init_state, make_train_step


def make_batch(rng: np.random.Generator, b: int) -> dict:
    return {
        "motion": jnp.asarray(rng.normal(scale=0.1, size=(b, 300, 168)).astype(np.float32)),
        "con": jnp.asarray(rng.normal(size=(b, 256)).astype(np.float32)),
        "emo": jnp.asarray(rng.normal(size=(b, 256)).astype(np.float32)),
        "sty": jnp.asarray(rng.normal(size=(b, 256)).astype(np.float32)),
        "betas": jnp.asarray(rng.normal(scale=0.5, size=(b, 300)).astype(np.float32)),
    }


def bench(
    batch_size: int, monitor: bool, vtex: bool, iters: int, bf16: bool = False,
    vtex_subsample: int = 0, reps: int = 3,
) -> tuple[float, dict]:
    from amuse_tpu.models.denoiser import DenoiserConfig
    from amuse_tpu.models.vae import PriorConfig

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    prior_cfg = PriorConfig(dtype=dtype)
    den_cfg = DenoiserConfig(dtype=dtype)
    cfg = GestureTrainConfig(batch_size=batch_size, vtex_displacement=vtex)
    model = (
        smplx_mod.make_test_model(
            num_vertices=10475, num_joints=55, num_betas=300,
            parents=smplx_mod.SMPLX_PARENTS,  # real released tree: FK depth 10
        )
        if vtex
        else None
    )
    if model is not None and vtex_subsample:
        model = smplx_mod.subsample_vertices(model, vtex_subsample)
    state = init_state(jax.random.key(0), prior_cfg, den_cfg, cfg)
    step = make_train_step(prior_cfg, den_cfg, cfg, smplx_model=model, with_monitor=monitor)
    batch = make_batch(np.random.default_rng(0), batch_size)

    # best-of-reps mean-of-iters: the tunnel's bursty per-sync overhead
    # poisons small-iters means (see benchmarks/_timing.timed_best)
    holder = {"state": state, "logs": None}

    def run(i):
        holder["state"], holder["logs"] = step(
            holder["state"], batch, jax.random.key(i)
        )
        return holder["logs"]

    dt, _spread = timed_best(
        run, lambda logs: np.asarray(logs["total"]), iters=iters, reps=reps
    )
    return dt, {k: float(v) for k, v in holder["logs"].items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--no-monitor", action="store_true")
    p.add_argument("--vtex", action="store_true")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--vtex-subsample", type=int, default=0,
                   help="monitor on an n-vertex subset (0 = full mesh); "
                        "reports vtex-loss agreement vs the subset mean")
    args = p.parse_args()

    dt, logs = bench(args.batch, not args.no_monitor, args.vtex, args.iters,
                     args.bf16, args.vtex_subsample)
    row = {
        "bench": "lpdm_train_step",
        "batch_windows": args.batch,
        "monitor": not args.no_monitor,
        "vtex": args.vtex,
        "vtex_subsample": args.vtex_subsample,
        "dtype": "bfloat16" if args.bf16 else "float32",
        "step_ms": round(dt * 1000, 2),
        "windows_per_sec": round(args.batch / dt, 1),
    }
    for k in ("rec_vtex_displacement", "gen_vtex_displacement"):
        if k in logs:
            row[k] = round(logs[k], 5)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
