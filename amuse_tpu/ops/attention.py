"""Fused multi-head attention Pallas kernel for the AST ViT blocks.

The stage-1 hot spot is self-attention over 1214 tokens x 768 dims x 12
layers x 3 encoders (SURVEY §3.1: "THE compute hot spot"). This kernel fuses
QK^T -> masked softmax -> PV into one VMEM-resident pass per (batch, head,
q-block) so the (S x S) score matrix never round-trips to HBM.

Design notes (sizes: S<=1280 padded, D_head=64):
  * K/V for one head fit comfortably in VMEM (1280 x 64 x bf16 = 160 KiB),
    so no online-softmax streaming is needed - each program computes full
    softmax rows for its q-block: simpler and faster at this scale than a
    flash-style K-loop.
  * grid = (B, H, S/BLOCK_Q); blocks are MXU-aligned (128 x 64).
  * padding columns are masked with -inf before the softmax; the padded
    query rows compute garbage that the caller slices off.
  * fp32 softmax accumulators; bf16 matmul inputs (preferred_element_type
    f32 on both dots).

``mha`` dispatches to the kernel on TPU and to a jnp.einsum reference
elsewhere (CPU tests compare the two in interpret mode).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_Q = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, length: int):
    q = q_ref[0, 0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0, 0].astype(jnp.float32)  # (S, D)
    v = v_ref[0, 0]  # (S, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, S)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mha_pallas(
    q: jax.Array,  # (B, H, S, D)
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused attention; S is padded internally to a BLOCK_Q multiple."""
    b, h, s, d = q.shape
    s_pad = _round_up(s, BLOCK_Q)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    scale = 1.0 / math.sqrt(d)

    kernel = functools.partial(_attn_kernel, scale=scale, length=s)
    out = pl.pallas_call(
        kernel,
        grid=(b, h, s_pad // BLOCK_Q),
        in_specs=[
            pl.BlockSpec(
                (1, 1, BLOCK_Q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, BLOCK_Q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:, :, :s, :]


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Pure-XLA attention with identical semantics (and the CPU path)."""
    d = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    p = jax.nn.softmax(s / math.sqrt(d), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v).astype(q.dtype)


def mha(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Backend dispatch: Pallas kernel on TPU, XLA elsewhere.

    Forward-only (inference / frozen-AST feature extraction - the BEAT cache
    regen and the infer pipeline); training uses the XLA path, whose
    backward XLA already fuses well at these sizes.
    """
    if jax.default_backend() == "tpu":
        return mha_pallas(q, k, v)
    return mha_reference(q, k, v)
