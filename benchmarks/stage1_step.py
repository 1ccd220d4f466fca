"""Stage-1 (AST disentangler) train-step benchmark on the real chip.

Measures wall-clock per optimizer step (and per quad) for the 16-way swap
objective (reference: scripts/trainer.py:188-333 ran this at batch 1 on an
A100-80GB). Variants: quad batch size, remat on/off.

Usage: python benchmarks/stage1_step.py [--batches 1,2,4] [--no-remat]
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

from amuse_tpu.models.ast import ASTConfig
from amuse_tpu.train.audio import AudioTrainConfig, init_state, make_train_step


def make_batch(rng: np.random.Generator, b: int, cfg: ASTConfig) -> dict:
    return {
        "fbanks": jnp.asarray(
            rng.normal(size=(b, 4, cfg.input_tdim, cfg.input_fdim)).astype(np.float32)
        ),
        "emo_id": jnp.asarray(rng.integers(0, 8, size=(b,)), jnp.int32),
        "a1_id": jnp.asarray(rng.integers(0, 30, size=(b,)), jnp.int32),
        "a2_id": jnp.asarray(rng.integers(0, 30, size=(b,)), jnp.int32),
    }


def bench_variant(
    b: int, remat: bool = False, flash: bool = True, iters: int = 10,
    reps: int = 3,
) -> float:
    ast_cfg = ASTConfig(remat=remat, flash_attention=flash)
    tcfg = AudioTrainConfig()
    state = init_state(jax.random.key(0), tcfg, ast_cfg=ast_cfg)
    step, _ = make_train_step(tcfg, ast_cfg=ast_cfg)
    batch = make_batch(np.random.default_rng(0), b, ast_cfg)

    # best-of-reps mean-of-iters (benchmarks/_timing.timed_best): the
    # tunnel's bursty per-sync overhead poisons small-iters means
    holder = {"state": state, "logs": None}

    def run(i):
        holder["state"], holder["logs"] = step(
            holder["state"], batch, jax.random.key(i)
        )
        return holder["logs"]

    dt, _spread = timed_best(
        run, lambda logs: np.asarray(logs["total"]), iters=iters, reps=reps
    )
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", default="1,2,4")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--no-flash", action="store_true")
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    remat = args.remat
    for b in [int(x) for x in args.batches.split(",")]:
        dt = bench_variant(b, remat, not args.no_flash, args.iters)
        print(
            json.dumps(
                {
                    "bench": "stage1_train_step",
                    "batch_quads": b,
                    "remat": remat,
                    "flash": not args.no_flash,
                    "step_ms": round(dt * 1000, 2),
                    "ms_per_quad": round(dt * 1000 / b, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
