"""Dissect the AST encoder-stack residual (fwd+bwd) on the real chip.

docs/PARITY.md round-3 roofline: one 12-layer stack at (4, 1214, 768)
measures ~40 ms fwd+bwd against a 15.9 ms matmul floor, and x3 encoders is
~79% of the stage-1 step. This harness measures WHERE the residual goes by
toggling block components one at a time (everything else identical):

  * baseline          - the shipped ViTBlock path (fused attention, erf GELU)
  * tanh_gelu         - tanh-approximate GELU
  * no_gelu           - identity after mlp_fc1 (GELU removed entirely)
  * no_ln             - LayerNorms replaced by identity (LN cost)
  * xla_attn          - XLA einsum+softmax attention (kernel win check)
  * no_attn           - attention replaced by identity on the qkv's q slice
                        (total attention cost incl. head split/transposes)
  * pad1280           - whole stack runs at S=1280 (pad once after pos-emb,
                        slice once at the end) so every gemm row count is a
                        multiple of 128*B and the kernel pad/slice vanishes
  * gemm_floor        - just the 4 gemms per layer x12 (achievable XLA gemm
                        ceiling at these shapes, not the analytic peak)
  * transpose_tax     - the 4 (B,S,H*D)<->(B,H,S,D) moveaxis copies per block
                        measured standalone x12 layers

Usage: python benchmarks/stack_dissect.py [--iters 20] [--batch 4]
"""

from __future__ import annotations

import argparse
import functools
import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from amuse_tpu.ops.attention import mha_fused_train, mha_reference

try:  # run as `python benchmarks/x.py` or `python -m benchmarks.x`
    from _timing import timeit_ms
except ImportError:
    from benchmarks._timing import timeit_ms

D = 768
HEADS = 12
HD = 64
MLP = 3072
EPS = 1e-6
DEPTH = 12


class Block(nn.Module):
    attn: str = "fused"  # fused | xla | none
    gelu: str = "erf"  # erf | tanh | none
    use_ln: bool = True

    @nn.compact
    def __call__(self, x):
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat, dtype=jnp.bfloat16, param_dtype=jnp.float32, name=name
        )
        ln = lambda name: (  # noqa: E731
            nn.LayerNorm(epsilon=EPS, dtype=jnp.bfloat16, name=name)
            if self.use_ln
            else (lambda t: t)
        )
        h = ln("norm1")(x)
        qkv = dense(3 * D, "qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.attn == "none":
            o = q
        else:
            split = lambda t: t.reshape(t.shape[:-1] + (HEADS, HD))  # noqa: E731
            q, k, v = split(q), split(k), split(v)
            if self.attn == "fused":
                o = mha_fused_train(
                    jnp.moveaxis(q, 2, 1), jnp.moveaxis(k, 2, 1), jnp.moveaxis(v, 2, 1)
                )
                o = jnp.moveaxis(o, 1, 2).reshape(x.shape)
            else:
                o = mha_reference(
                    jnp.moveaxis(q, 2, 1), jnp.moveaxis(k, 2, 1), jnp.moveaxis(v, 2, 1)
                )
                o = jnp.moveaxis(o, 1, 2).reshape(x.shape)
        x = x + dense(D, "attn_proj")(o)
        h = ln("norm2")(x)
        h = dense(MLP, "mlp_fc1")(h)
        if self.gelu != "none":
            h = nn.gelu(h, approximate=(self.gelu == "tanh"))
        return x + dense(D, "mlp_fc2")(h)


class Stack(nn.Module):
    attn: str = "fused"
    gelu: str = "erf"
    use_ln: bool = True
    pad_to: int = 0  # 0 = off; else pad S to this before the blocks

    @nn.compact
    def __call__(self, x):
        s = x.shape[1]
        if self.pad_to and self.pad_to > s:
            x = jnp.pad(x, ((0, 0), (0, self.pad_to - s), (0, 0)))
        for i in range(DEPTH):
            x = Block(self.attn, self.gelu, self.use_ln, name=f"b{i}")(x)
        return x[:, :s]


class GemmFloor(nn.Module):
    """Just the per-block gemms, no attention/LN/GELU/residual structure."""

    @nn.compact
    def __call__(self, x):
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat, dtype=jnp.bfloat16, param_dtype=jnp.float32, name=name
        )
        for i in range(DEPTH):
            h = dense(3 * D, f"qkv{i}")(x)
            x = x + dense(D, f"proj{i}")(h[..., :D])
            h = dense(MLP, f"fc1_{i}")(x)
            x = x + dense(D, f"fc2_{i}")(h)
        return x


def fwd_bwd_ms(model, x, iters) -> float:
    params = model.init(jax.random.key(0), x)

    @jax.jit
    def run(p, x):
        def loss(p):
            y = model.apply(p, x)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        return l, g

    return timeit_ms(run, iters, params, x)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seq", type=int, default=1214)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(args.batch, args.seq, D)), jnp.bfloat16)

    out: dict[str, float] = {}
    variants = {
        "baseline": Stack(),
        "tanh_gelu": Stack(gelu="tanh"),
        "no_gelu": Stack(gelu="none"),
        "no_ln": Stack(use_ln=False),
        "xla_attn": Stack(attn="xla"),
        "no_attn": Stack(attn="none"),
        "pad1280": Stack(pad_to=1280),
        "gemm_floor": GemmFloor(),
    }
    for name, model in variants.items():
        out[name] = round(fwd_bwd_ms(model, x, args.iters), 2)
        print(json.dumps({name: out[name]}), flush=True)

    # standalone transpose tax: 4 moveaxis copies per block fwd (3 in, 1 out)
    q = jnp.asarray(
        rng.normal(size=(args.batch, args.seq, HEADS, HD)), jnp.bfloat16
    )

    @jax.jit
    def trans(q):
        t = jnp.moveaxis(q, 2, 1)
        return jnp.moveaxis(t, 1, 2)

    per_roundtrip = timeit_ms(trans, args.iters * 5, q)
    out["transpose_tax_stack_fwd"] = round(per_roundtrip * 2 * DEPTH, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
