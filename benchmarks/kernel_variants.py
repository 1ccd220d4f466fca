"""Experimental fused-attention kernel variants, measured at stack scale.

Baseline: ops/attention.py 1.35 ms/layer fwd+bwd at (4, 12, 1214, 64) vs a
~0.73 ms matmul envelope (64-wide dots). The gap is VPU softmax work, so the
variants attack exactly that:

  v1_divfold   - forward: drop the (BQ, S) division pass; normalize the
                 (BQ, D) output rows instead. backward: work with
                 unnormalized e and row-sums r (algebraically identical).
  v0_dotsonly  - softmax stripped entirely (NOT parity): the MXU share.
  v3_headloop  - several heads per program, unrolled, for MXU/VPU overlap.
  v4_bf16dots  - bf16 dot inputs with f32 accumulation everywhere.
  v5_fullq_fwd - forward processes the whole padded S as one q-block.

Verdict (v5e, 12-call chains, fwd+bwd): the kernel is dot-bound; only the
division fold (~4%) and bf16 dot inputs (~5%) win, and both are now IN
ops/attention.py. Kept for the measurement trail.

Each variant is parity-checked against mha_reference before timing.

Usage: python benchmarks/kernel_variants.py [--iters 20]
"""

from __future__ import annotations

import argparse
import functools
import json
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amuse_tpu.ops.attention import mha_fused_train, mha_reference

try:  # run as `python benchmarks/x.py` or `python -m benchmarks.x`
    from _timing import timeit_ms
except ImportError:
    from benchmarks._timing import timeit_ms

B, H, S, D = 4, 12, 1214, 64
BQ = 640
S_PAD = 1280


# --------------------------------------------------------------------------
# v1: division folded out of the (BQ, S) plane
# --------------------------------------------------------------------------


def _fwd_kernel_v1(q_ref, k_ref, v_ref, o_ref, *, scale, length):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    r = jnp.sum(e, axis=-1, keepdims=True)  # (BQ, 1)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / r).astype(o_ref.dtype)  # (BQ, D) scale, not (BQ, S)


def _bwd_kernel_v1(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, length):
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)  # unnormalized
    r = jnp.sum(e, axis=-1, keepdims=True)

    don = do / r  # (BQ, D) row scale instead of normalizing p
    dp = jax.lax.dot_general(
        don, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # = do @ v^T / r
    # ds = p * (dp_n - rowsum(dp_n * p)) with p = e / r  ==
    #      e * (dp - rowsum(dp * e) / r) ... all in unnormalized terms:
    ds = e * (dp - jnp.sum(dp * e, axis=-1, keepdims=True) / r) * scale

    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_ref[0, 0] += jax.lax.dot_general(
        e, don, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _call_fwd(kernel, q, k, v, *, scale, length, extra_outs=0):
    b, h, s_pad, d = q.shape
    blk = lambda bs: pl.BlockSpec(  # noqa: E731
        (1, 1, bs, d), lambda bi, hi, qi: (bi, hi, qi if bs == BQ else 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, length=length),
        grid=(b, h, s_pad // BQ),
        in_specs=[blk(BQ), blk(s_pad), blk(s_pad)],
        out_specs=blk(BQ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
    )(q, k, v)


def _call_bwd(kernel, q, k, v, do, *, scale, length):
    b, h, s_pad, d = q.shape
    block = pl.BlockSpec(
        (1, 1, BQ, d), lambda bi, hi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM
    )
    block_o = pl.BlockSpec(
        (1, 1, BQ, d), lambda bi, hi, qi: (bi, hi, qi, 0), memory_space=pltpu.VMEM
    )
    full = pl.BlockSpec(
        (1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    full_o = pl.BlockSpec(
        (1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, length=length),
        grid=(b, h, s_pad // BQ),
        in_specs=[block, full, full, block],
        out_specs=(block_o, full_o, full_o),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ),
    )(q, k, v, do)


def make_variant(fwd_kernel, bwd_kernel):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def core(q, k, v, length):
        return _call_fwd(fwd_kernel, q, k, v, scale=1.0 / math.sqrt(D), length=length)

    def fwd(q, k, v, length):
        return core(q, k, v, length), (q, k, v)

    def bwd(length, res, do):
        q, k, v = res
        dq, dk, dv = _call_bwd(
            bwd_kernel, q, k, v, do, scale=1.0 / math.sqrt(D), length=length
        )
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)

    core.defvjp(fwd, bwd)

    @jax.jit
    def mha(q, k, v):
        b, h, s, d = q.shape
        s_pad = ((s + BQ - 1) // BQ) * BQ
        if s_pad != s:
            pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
            q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        return core(q, k, v, s)[:, :, :s, :]

    return mha


# --------------------------------------------------------------------------
# v4: v1 + bf16 MXU inputs everywhere (f32 accumulate). QK^T on bf16 inputs
# with preferred f32 is BIT-IDENTICAL to casting to f32 first (bf16 products
# are exact in f32, accumulation identical) but runs in the native MXU mode
# instead of the multi-pass f32 mode. Gradient dots round their f32 operand
# (ds, e) to bf16 - same precision class as the bf16 outputs themselves.
# --------------------------------------------------------------------------


def _fwd_kernel_v4(q_ref, k_ref, v_ref, o_ref, *, scale, length):
    q = q_ref[0, 0]  # bf16
    k = k_ref[0, 0]  # bf16
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    r = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / r).astype(o_ref.dtype)


def _bwd_kernel_v4(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, length):
    qi = pl.program_id(2)
    q = q_ref[0, 0]  # bf16
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    r = jnp.sum(e, axis=-1, keepdims=True)

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # bf16 x bf16, exact; normalization folded into ds below
    ds = e * (dp - jnp.sum(dp * e, axis=-1, keepdims=True) / r) / r * scale
    ds16 = ds.astype(jnp.bfloat16)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds16, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        ds16, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_ref[0, 0] += jax.lax.dot_general(
        (e / r).astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# --------------------------------------------------------------------------
# v0: dots-only envelope (NOT parity - measures the MXU share of the kernel)
# --------------------------------------------------------------------------


def _fwd_kernel_v0(q_ref, k_ref, v_ref, o_ref, *, scale, length):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    o = jax.lax.dot_general(
        s.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel_v0(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, length):
    qi = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    ds = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_ref[0, 0] += jax.lax.dot_general(
        s, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# v3: all heads in one program (unrolled loop) - grid (B, S/BQ). The head
# loop gives Mosaic independent MXU/VPU chains to overlap.
# --------------------------------------------------------------------------


HP = 2  # heads per program (VMEM-bounded: each head's score plane is live)
V3_BQ = 320  # smaller q-block: bwd keeps ~3 score planes per head live


def _fwd_kernel_v3(q_ref, k_ref, v_ref, o_ref, *, scale, length):
    for h in range(HP):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, h] = (o / r).astype(o_ref.dtype)


def _bwd_kernel_v3(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, length):
    qi = pl.program_id(2)
    for h in range(HP):
        q = q_ref[0, h].astype(jnp.float32)
        k = k_ref[0, h].astype(jnp.float32)
        v = v_ref[0, h].astype(jnp.float32)
        do = do_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        r = jnp.sum(e, axis=-1, keepdims=True)
        don = do / r
        dp = jax.lax.dot_general(
            don, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = e * (dp - jnp.sum(dp * e, axis=-1, keepdims=True) / r) * scale
        dq_ref[0, h] = jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype)

        @pl.when(qi == 0)
        def _():
            dk_ref[0, h] = jnp.zeros_like(dk_ref[0, h])
            dv_ref[0, h] = jnp.zeros_like(dv_ref[0, h])

        dk_ref[0, h] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv_ref[0, h] += jax.lax.dot_general(
            e, don, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )


def _call_fwd_v3(q, k, v, *, scale, length):
    b, h, s_pad, d = q.shape
    blk = lambda rows, qmap: pl.BlockSpec(  # noqa: E731
        (1, HP, rows, d), qmap, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_v3, scale=scale, length=length),
        grid=(b, h // HP, s_pad // V3_BQ),
        in_specs=[
            blk(V3_BQ, lambda bi, hi, qi: (bi, hi, qi, 0)),
            blk(s_pad, lambda bi, hi, qi: (bi, hi, 0, 0)),
            blk(s_pad, lambda bi, hi, qi: (bi, hi, 0, 0)),
        ],
        out_specs=blk(V3_BQ, lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
    )(q, k, v)


def _call_bwd_v3(q, k, v, do, *, scale, length):
    b, h, s_pad, d = q.shape
    blk = lambda rows, qmap: pl.BlockSpec(  # noqa: E731
        (1, HP, rows, d), qmap, memory_space=pltpu.VMEM
    )
    part = lambda: blk(V3_BQ, lambda bi, hi, qi: (bi, hi, qi, 0))  # noqa: E731
    full = lambda: blk(s_pad, lambda bi, hi, qi: (bi, hi, 0, 0))  # noqa: E731
    return pl.pallas_call(
        functools.partial(_bwd_kernel_v3, scale=scale, length=length),
        grid=(b, h // HP, s_pad // V3_BQ),
        in_specs=[part(), full(), full(), part()],
        out_specs=(part(), full(), full()),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ),
    )(q, k, v, do)


def make_v3():
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def core(q, k, v, length):
        return _call_fwd_v3(q, k, v, scale=1.0 / math.sqrt(D), length=length)

    def fwd(q, k, v, length):
        return core(q, k, v, length), (q, k, v)

    def bwd(length, res, do):
        q, k, v = res
        dq, dk, dv = _call_bwd_v3(q, k, v, do, scale=1.0 / math.sqrt(D), length=length)
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)

    core.defvjp(fwd, bwd)

    @jax.jit
    def mha(q, k, v):
        b, h, s, d = q.shape
        s_pad = ((s + BQ - 1) // BQ) * BQ
        if s_pad != s:
            pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
            q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        return core(q, k, v, s)[:, :, :s, :]

    return mha


def make_v5():
    """v4 math; fwd runs one whole-S q-block (grid (B, H, 1)), bwd at BQ."""

    def call_fwd(q, k, v, *, scale, length):
        b, h, s_pad, d = q.shape
        full = pl.BlockSpec(
            (1, 1, s_pad, d), lambda bi, hi: (bi, hi, 0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            functools.partial(_fwd_kernel_v4, scale=scale, length=length),
            grid=(b, h),
            in_specs=[full, full, full],
            out_specs=full,
            out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        )(q, k, v)

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def core(q, k, v, length):
        return call_fwd(q, k, v, scale=1.0 / math.sqrt(D), length=length)

    def fwd(q, k, v, length):
        return core(q, k, v, length), (q, k, v)

    def bwd(length, res, do):
        q, k, v = res
        dq, dk, dv = _call_bwd(
            _bwd_kernel_v4, q, k, v, do, scale=1.0 / math.sqrt(D), length=length
        )
        return dq, dk.astype(k.dtype), dv.astype(v.dtype)

    core.defvjp(fwd, bwd)

    @jax.jit
    def mha(q, k, v):
        b, h, s, d = q.shape
        s_pad = ((s + BQ - 1) // BQ) * BQ
        if s_pad != s:
            pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
            q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
        return core(q, k, v, s)[:, :, :s, :]

    return mha


def chain(attn):
    def loss(x):
        q = x
        acc = 0.0
        for _ in range(12):
            o = attn(q, x, x)
            acc = acc + jnp.sum(o.astype(jnp.float32) ** 2)
            q = o
        return acc

    return jax.jit(jax.value_and_grad(loss))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, S, D)) * 0.05, jnp.bfloat16)

    v1 = make_variant(_fwd_kernel_v1, _bwd_kernel_v1)

    # parity vs reference (values + grads)
    def l_ref(q):
        return jnp.sum(mha_reference(q, x, x).astype(jnp.float32) ** 2)

    def l_v1(q):
        return jnp.sum(v1(q, x, x).astype(jnp.float32) ** 2)

    g_ref = jax.grad(l_ref)(x)
    g_v1 = jax.grad(l_v1)(x)
    o_dev = float(jnp.max(jnp.abs(
        mha_reference(x, x, x).astype(jnp.float32) - v1(x, x, x).astype(jnp.float32)
    )))
    g_dev = float(jnp.max(jnp.abs(g_ref.astype(jnp.float32) - g_v1.astype(jnp.float32))))
    print(json.dumps({"v1_out_dev": o_dev, "v1_grad_dev": g_dev}), flush=True)

    v0 = make_variant(_fwd_kernel_v0, _bwd_kernel_v0)
    v3 = make_v3()
    g_v3 = jax.grad(lambda q: jnp.sum(v3(q, x, x).astype(jnp.float32) ** 2))(x)
    o3_dev = float(jnp.max(jnp.abs(
        mha_reference(x, x, x).astype(jnp.float32) - v3(x, x, x).astype(jnp.float32)
    )))
    g3_dev = float(jnp.max(jnp.abs(g_ref.astype(jnp.float32) - g_v3.astype(jnp.float32))))
    print(json.dumps({"v3_out_dev": o3_dev, "v3_grad_dev": g3_dev}), flush=True)

    v4 = make_variant(_fwd_kernel_v4, _bwd_kernel_v4)
    g_v4 = jax.grad(lambda q: jnp.sum(v4(q, x, x).astype(jnp.float32) ** 2))(x)
    o4_dev = float(jnp.max(jnp.abs(
        mha_reference(x, x, x).astype(jnp.float32) - v4(x, x, x).astype(jnp.float32)
    )))
    g4_dev = float(jnp.max(jnp.abs(g_ref.astype(jnp.float32) - g_v4.astype(jnp.float32))))
    g_scale = float(jnp.max(jnp.abs(g_ref.astype(jnp.float32))))
    print(json.dumps({"v4_out_dev": o4_dev, "v4_grad_dev": g4_dev,
                      "grad_scale": g_scale}), flush=True)

    out = {}
    out["baseline"] = round(timeit_ms(chain(mha_fused_train), args.iters, x), 2)
    out["v1_divfold"] = round(timeit_ms(chain(v1), args.iters, x), 2)
    out["v0_dotsonly"] = round(timeit_ms(chain(v0), args.iters, x), 2)
    out["v3_headloop"] = round(timeit_ms(chain(v3), args.iters, x), 2)
    out["v4_bf16dots"] = round(timeit_ms(chain(v4), args.iters, x), 2)
    v5 = make_v5()
    o5 = v5(x, x, x)
    o5_dev = float(jnp.max(jnp.abs(
        mha_reference(x, x, x).astype(jnp.float32) - o5.astype(jnp.float32)
    )))
    out["v5_out_dev"] = o5_dev
    out["v5_fullq_fwd"] = round(timeit_ms(chain(v5), args.iters, x), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
