"""Optimizer-update microbenchmark: optax chain vs one-pass fused Adam.

docs/PARITY.md's stage-1 decomposition measured the optax update at 34.6 ms
standalone over the 424.7M-param tree vs a ~14.5 ms pure-HBM floor (7
passes x 1.7 GB at 819 GB/s on v5e). train/fused_adam.py removes the
intermediate *updates* trees the optax chain materializes; this benchmark
measures both on the REAL stage-1 param tree, fully donated, so the table
in docs/PARITY.md is apples-to-apples.

Usage: python benchmarks/optimizer_update.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from amuse_tpu.train.audio import AudioTrainConfig, init_state, make_optimizer
from amuse_tpu.train.fused_adam import make_fused_adam

try:  # run as `python benchmarks/x.py` or `python -m benchmarks.x`
    from _timing import timeit_ms
except ImportError:
    from benchmarks._timing import timeit_ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    tcfg = AudioTrainConfig()
    state = init_state(jax.random.key(0), tcfg)
    params = state.params
    del state  # keep exactly one param tree + one optimizer state in HBM
    grads = jax.tree.map(jnp.ones_like, params)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    out = {"n_params_m": round(n_params / 1e6, 1)}
    # 7 minimal HBM passes: read p/g/m/v, write p/m/v (f32)
    out["hbm_floor_ms_v5e"] = round(7 * n_params * 4 / 819e9 * 1e3, 1)

    # --- A) the optax chain train/audio.py used (L2 wd -> adam -> -lr) ----
    opt = make_optimizer(tcfg)
    opt_state = opt.init(params)

    @lambda f: jax.jit(f, donate_argnums=(1, 2))
    def upd(g, os, p):
        u, os2 = opt.update(g, os, p)
        return optax.apply_updates(p, u), os2

    def run_optax():
        nonlocal opt_state, params
        params, opt_state = upd(grads, opt_state, params)
        return params

    out["optax_chain_ms"] = round(timeit_ms(run_optax, args.iters), 1)
    del opt_state

    # --- B) fused one-pass equivalent (same math, tests/test_fused_adam) --
    fused = make_fused_adam(
        b1=tcfg.beta1, b2=tcfg.beta2, weight_decay=tcfg.weight_decay, mode="l2"
    )
    fstate = fused.init(params, tcfg.learning_rate)

    @lambda f: jax.jit(f, donate_argnums=(0, 1))
    def fupd(fs, p, g):
        p2, fs2 = fused.apply(fs, p, g)
        return p2, fs2

    def run_fused():
        nonlocal fstate, params
        params, fstate = fupd(fstate, params, grads)
        return params

    out["fused_ms"] = round(timeit_ms(run_fused, args.iters), 1)
    out["speedup"] = round(out["optax_chain_ms"] / out["fused_ms"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
