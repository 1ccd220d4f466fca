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


def _pick_block_q(s_pad: int) -> int:
    """Largest q-block (multiple of 128, <= 640) dividing the padded length.

    Measured on v5e at the AST shape (S 1214 -> padded 1280): block 640 beats
    128 by ~9% on the 12-layer stack fwd+bwd (fewer grid steps, same VMEM
    residency - K/V blocks are revisited, not refetched). 640 x 1280 fp32
    scratch rows stay well inside VMEM.
    """
    for cand in (640, 512, 384, 256, 128):
        if s_pad % cand == 0:
            return cand
    return 128


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, length: int):
    # Dots run on the operand dtype with f32 accumulation: for bf16 inputs
    # bf16 x bf16 products are EXACT in f32 (8-bit mantissas), so this is
    # numerically identical to casting to f32 first while using the native
    # MXU input mode. The softmax plane itself stays f32.
    q = q_ref[0, 0]  # (BQ, D)
    k = k_ref[0, 0]  # (S, D)
    v = v_ref[0, 0]  # (S, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, S)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)  # unnormalized, in (0, 1]
    r = jnp.sum(e, axis=-1, keepdims=True)
    # division folded OUT of the (BQ, S) plane: normalize the (BQ, D) output
    # rows instead (one full-plane VPU pass saved; measured ~4% kernel win)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (o / r).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "block_q"))
def mha_pallas(
    q: jax.Array,  # (B, H, S, D)
    k: jax.Array,
    v: jax.Array,
    interpret: bool = False,
    block_q: int | None = None,
) -> jax.Array:
    """Fused attention; S is padded internally to a q-block multiple.

    NOTE: deliberately NOT custom_partitioning-wrapped: the inference
    pipeline vmaps this over stacked encoder params, and jax has no
    batching rule for custom_partitioning (measured crash). Multi-device
    data-parallel callers (prepare_data's frozen-AST pass) wrap the WHOLE
    encode in shard_map instead, inside which this kernel sees per-device
    local shapes and needs no partitioning rule.
    """
    b, h, s, d = q.shape
    bq = block_q or _pick_block_q(_round_up(s, BLOCK_Q))
    # pad to a bq multiple: an explicit bq need not divide round_up(s, 128),
    # and a truncating grid would leave trailing query rows unwritten
    s_pad = _round_up(s, bq)
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    return _mha_fwd_padded_raw(q, k, v, length=s, interpret=interpret, block_q=bq)[
        :, :, :s, :
    ]


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


# ---------------------------------------------------------------------------
# Training-grade fused attention (forward + backward, custom VJP)
# ---------------------------------------------------------------------------
#
# The backward recomputes the softmax per q-block in VMEM (standard
# flash-style recompute: residuals are just q, k, v) and accumulates dK/dV
# across the sequential q-block grid steps by revisiting the same output
# block - so the (S, S) score matrix never lives in HBM in EITHER direction.
# Measured on v5e this beats both the XLA einsum+softmax path and the
# generic jax.experimental flash kernel at the AST shape (see docs/PARITY.md).


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale: float, length: int
):
    qi = pl.program_id(2)
    # operands stay in their storage dtype; every dot accumulates in f32
    # (bf16 inputs: exact products, native MXU mode - see _attn_kernel)
    q = q_ref[0, 0]  # (BQ, D)
    k = k_ref[0, 0]  # (S, D)
    v = v_ref[0, 0]  # (S, D)
    do = do_ref[0, 0]  # (BQ, D)

    # recompute the softmax rows for this q-block (identical to forward)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, S)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
    s = jnp.where(col < length, s, jnp.finfo(jnp.float32).min)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)  # (BQ, S); pad cols exactly 0

    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, S)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale  # (BQ, S)
    ds_c = ds.astype(k.dtype)  # dot-input rounding, same class as the bf16
    p_c = p.astype(do.dtype)  # outputs themselves (f32 inputs: no-ops)

    dq_ref[0, 0] = jax.lax.dot_general(
        ds_c, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)

    # dK/dV accumulate over q-blocks: same output block revisited each qi
    # (TPU grids run sequentially, so read-modify-write is well-defined)
    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        ds_c, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, D)
    dv_ref[0, 0] += jax.lax.dot_general(
        p_c, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, D)


def _batch_head_partitioned(fn, n_in: int, n_out: int):
    """Wrap a (B, H, S, D)-operand kernel call for SPMD partitioning.

    Pallas calls are opaque to GSPMD/shardy: under a sharded jit they would
    otherwise be all-gathered and run replicated on every device. Attention
    is embarrassingly parallel over batch and heads, so we register exactly
    that: factors b and h partition freely, s and d must be replicated.
    Each device then runs the kernel on its LOCAL batch shard - the
    data-parallel mesh story (SURVEY §2.2) holds with the fused kernel on.
    """
    from jax.experimental.custom_partitioning import custom_partitioning

    cp = custom_partitioning(fn)

    def _project(named_sharding, mesh):
        from jax.sharding import NamedSharding, PartitionSpec

        spec = getattr(named_sharding, "spec", None)
        if spec is None:
            return NamedSharding(mesh, PartitionSpec())
        keep = tuple(spec[i] if i < len(spec) else None for i in range(2))
        return NamedSharding(mesh, PartitionSpec(*keep, None, None))

    def partition(mesh, arg_shapes, result_shape):
        arg_sh = tuple(_project(a.sharding, mesh) for a in arg_shapes)
        # all operands must agree on the (b, h) partitioning: take q's
        out_sh = (arg_sh[0],) * n_out if n_out > 1 else arg_sh[0]
        in_sh = (arg_sh[0],) * n_in
        return mesh, fn, out_sh, in_sh

    def infer(mesh, arg_shapes, result_shape):
        out = _project(arg_shapes[0].sharding, mesh)
        return (out,) * n_out if n_out > 1 else out

    sig_in = ", ".join(["b h s d"] * n_in)
    sig_out = ", ".join(["b h s d"] * n_out)
    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"{sig_in} -> {sig_out}",
        need_replication_factors=("s", "d"),
    )
    return cp


def _vma(*xs) -> frozenset:
    """Union of the operands' varying-manual-axes (mesh axes this value is
    per-device-distinct over, under shard_map; frozenset() under plain jit)."""
    out: frozenset = frozenset()
    for x in xs:
        out = out | getattr(jax.typeof(x), "vma", frozenset())
    return out


def _mha_fwd_padded_raw(q, k, v, *, length: int, interpret: bool, block_q: int):
    """Forward on pre-padded (B, H, S_pad, D) inputs; pad cols masked."""
    b, h, s_pad, d = q.shape
    scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_attn_kernel, scale=scale, length=length)
    return pl.pallas_call(
        kernel,
        grid=(b, h, s_pad // block_q),
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
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
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        # propagate the varying-manual-axes set: inside shard_map (the
        # prepare_data frozen-AST pass) jax>=0.9 checks vma on pallas_call
        # outputs; outside shard_map this is frozenset() and a no-op
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype, vma=_vma(q, k, v)),
        interpret=interpret,
    )(q, k, v)


def _mha_bwd_padded_raw(q, k, v, do, *, length: int, interpret: bool, block_q: int):
    """Backward kernels on pre-padded operands -> (dq, dk_f32, dv_f32)."""
    b, h, s_pad, d = q.shape
    scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_attn_bwd_kernel, scale=scale, length=length)
    block = lambda: pl.BlockSpec(  # noqa: E731 - per-q-block operands
        (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    full = lambda: pl.BlockSpec(  # noqa: E731 - whole-sequence operands
        (1, 1, s_pad, d), lambda bi, hi, qi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h, s_pad // block_q),
        in_specs=[block(), full(), full(), block()],
        out_specs=(block(), full(), full()),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype, vma=_vma(q, k, v, do)),
            # f32 accumulators
            jax.ShapeDtypeStruct(k.shape, jnp.float32, vma=_vma(q, k, v, do)),
            jax.ShapeDtypeStruct(v.shape, jnp.float32, vma=_vma(q, k, v, do)),
        ),
        interpret=interpret,
    )(q, k, v, do)


@functools.lru_cache(maxsize=None)
def _cp_fwd(length: int, interpret: bool, block_q: int):
    def fwd(q, k, v):  # plain positional closure: custom_partitioning
        return _mha_fwd_padded_raw(  # cannot resolve partial-bound kwargs
            q, k, v, length=length, interpret=interpret, block_q=block_q
        )

    return _batch_head_partitioned(fwd, n_in=3, n_out=1)


@functools.lru_cache(maxsize=None)
def _cp_bwd(length: int, interpret: bool, block_q: int):
    def bwd(q, k, v, do):
        return _mha_bwd_padded_raw(
            q, k, v, do, length=length, interpret=interpret, block_q=block_q
        )

    return _batch_head_partitioned(bwd, n_in=4, n_out=3)


def _mha_fwd_padded(q, k, v, length: int, interpret: bool, block_q: int):
    return _cp_fwd(length, interpret, block_q)(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mha_core(q, k, v, length: int, interpret: bool, block_q: int):
    return _mha_fwd_padded(q, k, v, length, interpret, block_q)


def _mha_core_fwd(q, k, v, length: int, interpret: bool, block_q: int):
    return _mha_fwd_padded(q, k, v, length, interpret, block_q), (q, k, v)


def _mha_core_bwd(length: int, interpret: bool, block_q: int, res, do):
    q, k, v = res
    dq, dk, dv = _cp_bwd(length, interpret, block_q)(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


_mha_core.defvjp(_mha_core_fwd, _mha_core_bwd)


@functools.partial(jax.jit, static_argnames=("interpret", "block_q"))
def mha_fused_train(q, k, v, interpret: bool = False, block_q: int | None = None):
    """Differentiable fused attention on (B, H, S, D); pads S internally.

    Padded q rows: their output is sliced off, so their cotangent arrives as
    zeros -> ds = 0 -> no dK/dV pollution. Padded k columns: masked to -inf
    in both passes, so p = 0 there and dk/dv stay 0.
    """
    b, h, s, d = q.shape
    bq = block_q or _pick_block_q(_round_up(s, BLOCK_Q))
    s_pad = _round_up(s, bq)  # an explicit bq must still tile the grid fully
    if s_pad != s:
        pad = [(0, 0), (0, 0), (0, s_pad - s), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    return _mha_core(q, k, v, s, interpret, bq)[:, :, :s, :]


def mha_train(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Differentiable fused attention: Pallas kernels on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return mha_fused_train(q, k, v)
    return mha_reference(q, k, v)
