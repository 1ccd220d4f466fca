"""Isolate the fused-attention kernel cost from its glue at stack scale.

Chains 12 attention calls inside ONE jit (like the 12-layer stack) so the
per-dispatch tunnel latency amortizes — standalone per-op microbenchmarks
through the remote-TPU tunnel measure dispatch, not compute.

Variants (all fwd+bwd via value_and_grad on a scalar loss):
  * kernel_shaped   - 12x mha_fused_train on (B, H, S, D) inputs (no glue)
  * kernel_prepad   - same but S pre-padded to 1280 (isolates the pad/slice)
  * kernel_glued    - 12x [split + moveaxis + kernel + moveaxis + reshape]
                      from a (B, S, 3d) qkv tensor (the ViTBlock glue)
  * xla_shaped      - 12x mha_reference on (B, H, S, D) (XLA softmax attn)

Usage: python benchmarks/attn_probe.py [--iters 20]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.ops.attention import mha_fused_train, mha_reference

try:  # run as `python benchmarks/x.py` or `python -m benchmarks.x`
    from _timing import timeit_ms
except ImportError:
    from benchmarks._timing import timeit_ms

B, H, S, D = 4, 12, 1214, 64
EMB = H * D


def chain(attn, x0):
    """12 serial attention calls; each layer's q shifts by the prev output."""

    def loss(x):
        q = x
        acc = 0.0
        for _ in range(12):
            o = attn(q, x, x)
            acc = acc + jnp.sum(o.astype(jnp.float32) ** 2)
            q = o  # serialize the chain
        return acc

    return jax.jit(jax.value_and_grad(loss)), x0


def chain_glued(x0):
    """From (B, S, 3*EMB) qkv: the exact ViTBlock glue around the kernel."""

    def loss(qkv):
        acc = 0.0
        for _ in range(12):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            sp = lambda t: t.reshape(t.shape[:-1] + (H, D))  # noqa: E731
            q, k, v = sp(q), sp(k), sp(v)
            o = mha_fused_train(
                jnp.moveaxis(q, 2, 1), jnp.moveaxis(k, 2, 1), jnp.moveaxis(v, 2, 1)
            )
            o = jnp.moveaxis(o, 1, 2).reshape(qkv.shape[0], qkv.shape[1], EMB)
            acc = acc + jnp.sum(o.astype(jnp.float32) ** 2)
            qkv = jnp.concatenate([o, o, o], axis=-1)
        return acc

    return jax.jit(jax.value_and_grad(loss))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.02, jnp.bfloat16)
    xp = jnp.asarray(rng.normal(size=(B, H, 1280, D)) * 0.02, jnp.bfloat16)
    qkv = jnp.asarray(rng.normal(size=(B, S, 3 * EMB)) * 0.02, jnp.bfloat16)

    out = {}
    f, x0 = chain(mha_fused_train, x)
    out["kernel_shaped"] = round(timeit_ms(f, args.iters, x0), 2)
    f, x0 = chain(mha_fused_train, xp)
    out["kernel_prepad"] = round(timeit_ms(f, args.iters, x0), 2)
    f = chain_glued(qkv)
    out["kernel_glued"] = round(timeit_ms(f, args.iters, qkv), 2)
    f, x0 = chain(mha_reference, x)
    out["xla_shaped"] = round(timeit_ms(f, args.iters, x0), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
