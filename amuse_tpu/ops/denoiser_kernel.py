"""VMEM-resident DDIM sampling kernel: the entire 50-step denoiser loop in
one Pallas program.

The sampling hot loop is 50 sequential forwards of a small 9-layer
skip-transformer over 5 tokens x 128 dims (models/latent_diffusion/
denoiser.py via diffusion_backward). As XLA ops this is dispatch-dominated:
~%60 tiny kernels per step round-tripping activations through HBM. Here the
whole loop becomes ONE kernel:

  * all denoiser weights (~1.5 M params, bf16 ~3 MB) are loaded into VMEM
    once and stay resident across all 50 steps,
  * conditioning tokens and per-step time tokens are precomputed outside
    (they do not depend on the latent), so each step inside the kernel is
    just 9 transformer layers + a fused DDIM update,
  * the eta=0 epsilon-prediction DDIM step needs only four per-step
    scalars precomputed host-side: pred_x0 = (x - sqrt(1-a_t) eps)
    / sqrt(a_t), clamped to [-1, 1] (diffusers' clip_sample=True default,
    which the reference inherits - see schedulers.ddim_step), then
    x' = sqrt(a_prev) pred_x0 + sqrt(1-a_prev) eps,
  * tokens are padded 5 -> 8 rows (f32 sublane tile); attention masks the
    padding columns, all other ops are row-local so the pad rows are inert.

Parity with the XLA path is pinned in tests/test_denoiser_kernel.py
(interpret mode).

MEASUREMENT (TPU v5e, 50 steps, flagship dims): XLA scan 3.9 ms vs this
kernel 6.0 ms at batch 1. XLA's static schedule already keeps the scan body
on-chip; the kernel's per-head lane-sliced matmuls cost Mosaic relayouts
that outweigh the HBM savings at 5-token scale. Kept as a tested optional
path (and the template for future fused small-model loops); the pipeline
defaults to the XLA scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amuse_tpu.diffusion.schedulers import DiffusionSchedule, ddim_timesteps
from amuse_tpu.models.denoiser import DenoiserConfig, timestep_embedding

TOKENS = 8  # padded sequence (5 real: latent, time, con, emo, sty)
REAL_TOKENS = 5
D = 128
FF = 512
LAYERS = 9
HEADS = 4
HEAD_DIM = D // HEADS
N_SKIP = (LAYERS - 1) // 2


class PackedDenoiser(NamedTuple):
    """Stacked per-layer weights (leading dim 9, order: in0..in3, mid,
    out0..out3) + skip merges + final norm, ready for VMEM residence."""

    wq: jax.Array  # (9, D, D)
    wk: jax.Array
    wv: jax.Array
    wo: jax.Array
    bq: jax.Array  # (9, D)
    bk: jax.Array
    bv: jax.Array
    bo: jax.Array
    w1: jax.Array  # (9, D, FF)
    b1: jax.Array  # (9, FF)
    w2: jax.Array  # (9, FF, D)
    b2: jax.Array  # (9, D)
    ln_scale: jax.Array  # (9, 2, D)
    ln_bias: jax.Array  # (9, 2, D)
    wskip: jax.Array  # (4, 2D, D)
    bskip: jax.Array  # (4, D)
    final_scale: jax.Array  # (D,)
    final_bias: jax.Array  # (D,)


def pack_denoiser(params: dict, dtype=jnp.float32) -> PackedDenoiser:
    """Flax Denoiser params -> stacked arrays (encoder sub-tree)."""
    enc = params["encoder"]
    order = [f"in_{i}" for i in range(N_SKIP)] + ["mid"] + [f"out_{i}" for i in range(N_SKIP)]

    def stack(fn):
        return jnp.stack([jnp.asarray(fn(enc[name]), dtype) for name in order])

    return PackedDenoiser(
        wq=stack(lambda l: l["self_attn"]["q_proj"]["kernel"]),
        wk=stack(lambda l: l["self_attn"]["k_proj"]["kernel"]),
        wv=stack(lambda l: l["self_attn"]["v_proj"]["kernel"]),
        wo=stack(lambda l: l["self_attn"]["out_proj"]["kernel"]),
        bq=stack(lambda l: l["self_attn"]["q_proj"]["bias"]),
        bk=stack(lambda l: l["self_attn"]["k_proj"]["bias"]),
        bv=stack(lambda l: l["self_attn"]["v_proj"]["bias"]),
        bo=stack(lambda l: l["self_attn"]["out_proj"]["bias"]),
        w1=stack(lambda l: l["ffn"]["linear1"]["kernel"]),
        b1=stack(lambda l: l["ffn"]["linear1"]["bias"]),
        w2=stack(lambda l: l["ffn"]["linear2"]["kernel"]),
        b2=stack(lambda l: l["ffn"]["linear2"]["bias"]),
        ln_scale=jnp.stack(
            [
                jnp.stack(
                    [jnp.asarray(enc[n]["norm1"]["scale"], dtype), jnp.asarray(enc[n]["norm2"]["scale"], dtype)]
                )
                for n in order
            ]
        ),
        ln_bias=jnp.stack(
            [
                jnp.stack(
                    [jnp.asarray(enc[n]["norm1"]["bias"], dtype), jnp.asarray(enc[n]["norm2"]["bias"], dtype)]
                )
                for n in order
            ]
        ),
        wskip=jnp.stack(
            [jnp.asarray(enc[f"skip_{i}"]["kernel"], dtype) for i in range(N_SKIP)]
        ),
        bskip=jnp.stack(
            [jnp.asarray(enc[f"skip_{i}"]["bias"], dtype) for i in range(N_SKIP)]
        ),
        final_scale=jnp.asarray(enc["norm"]["scale"], dtype),
        final_bias=jnp.asarray(enc["norm"]["bias"], dtype),
    )


def precompute_conditioning(
    params: dict,
    cfg: DenoiserConfig,
    schedule: DiffusionSchedule,
    con: jax.Array,  # (B, cond_dim)
    emo: jax.Array,
    sty: jax.Array,
    num_steps: int = 50,
):
    """Host/XLA-side prep: per-step time tokens (with positions folded in),
    conditioning tokens (positions folded in), and the per-step DDIM
    (A_i, B_i) coefficients."""
    from amuse_tpu.models.denoiser import CondProj, TimestepMLP

    ts = ddim_timesteps(schedule, num_steps)  # (50,) descending
    t_sin = timestep_embedding(ts.astype(jnp.float32), cfg.cond_dim, cfg.flip_sin_to_cos, cfg.freq_shift)
    time_tokens = TimestepMLP(cfg.latent_dim).apply(
        {"params": params["time_mlp"]}, t_sin
    )  # (50, D)

    pos = params["pos"]["pe"]  # (max_len, D)
    time_tokens = time_tokens + pos[1]
    cond_tokens = []
    for name, val in (("proj_con", con), ("proj_emo", emo), ("proj_sty", sty)):
        tok = CondProj(cfg.latent_dim).apply({"params": params[name]}, val)
        cond_tokens.append(tok)
    cond = jnp.stack(cond_tokens, axis=1)  # (B, 3, D)
    cond = cond + pos[None, 2:5, :]

    acp = schedule.alphas_cumprod
    a_t = acp[ts]
    prev = ts - schedule.num_train_timesteps // num_steps
    a_prev = jnp.where(prev >= 0, acp[jnp.maximum(prev, 0)], acp[0])
    # per-step scalars for the (possibly clipped) DDIM update:
    #   pred_x0 = (x - c1 eps) * c0 ; clip ; x' = c2 pred_x0 + c3 eps
    coeffs = jnp.stack(
        [
            1.0 / jnp.sqrt(a_t),
            jnp.sqrt(1.0 - a_t),
            jnp.sqrt(a_prev),
            jnp.sqrt(1.0 - a_prev),
        ],
        axis=1,
    )  # (50, 4)
    return time_tokens, cond, coeffs, pos[0]


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7): Mosaic has no
    erf/erfc lowering, and 1e-7 accuracy keeps gelu parity at f32 noise."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _layer(x, i, w, mask_cols):
    """One post-norm encoder layer on an (8, D) token block, f32 compute."""
    q = jnp.dot(x, w.wq[i].astype(jnp.float32)) + w.bq[i].astype(jnp.float32)
    k = jnp.dot(x, w.wk[i].astype(jnp.float32)) + w.bk[i].astype(jnp.float32)
    v = jnp.dot(x, w.wv[i].astype(jnp.float32)) + w.bv[i].astype(jnp.float32)
    # per-head attention as a static loop of 2D matmuls (Mosaic has no
    # batched-3D matmul lowering); 4 heads x (8x32 @ 32x8) is trivial work.
    neg = jnp.finfo(jnp.float32).min
    outs = []
    for h in range(HEADS):
        sl = slice(h * HEAD_DIM, (h + 1) * HEAD_DIM)
        qh, kh, vh = q[:, sl], k[:, sl], v[:, sl]
        scores = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) / np.sqrt(HEAD_DIM)
        scores = jnp.where(mask_cols[None, :], scores, neg)
        p = jax.nn.softmax(scores, axis=-1)
        outs.append(
            jax.lax.dot_general(
                p, vh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        )
    o = jnp.concatenate(outs, axis=-1)  # (TOKENS, D)
    o = jnp.dot(o, w.wo[i].astype(jnp.float32)) + w.bo[i].astype(jnp.float32)

    def ln(y, which):
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean((y - mu) ** 2, axis=-1, keepdims=True)
        yn = (y - mu) * jax.lax.rsqrt(var + 1e-5)
        return yn * w.ln_scale[i, which].astype(jnp.float32) + w.ln_bias[i, which].astype(jnp.float32)

    x = ln(x + o, 0)
    h = jnp.dot(x, w.w1[i].astype(jnp.float32)) + w.b1[i].astype(jnp.float32)
    h = _gelu_exact(h)
    h = jnp.dot(h, w.w2[i].astype(jnp.float32)) + w.b2[i].astype(jnp.float32)
    return ln(x + h, 1)


def _sampler_kernel(
    time_ref, cond_ref, coeff_ref, pos0_ref, x0_ref,
    *weight_refs,
    out_ref,
    num_steps: int,
    clip_sample: bool = True,
    clip_sample_range: float = 1.0,
):
    w = PackedDenoiser(*[r[:] for r in weight_refs])
    mask_cols = jax.lax.broadcasted_iota(jnp.int32, (TOKENS,), 0) < REAL_TOKENS
    cond = cond_ref[:]  # (3, D) f32
    pos0 = pos0_ref[:]  # (1, D)

    def step(i, latent):
        time_row = time_ref[pl.ds(i, 1), :]  # (1, D) dynamic row
        xseq = jnp.concatenate(
            [
                latent + pos0,
                time_row,
                cond,
                jnp.zeros((TOKENS - REAL_TOKENS, D), jnp.float32),
            ],
            axis=0,
        )
        skips = []
        x = xseq
        for li in range(N_SKIP):
            x = _layer(x, li, w, mask_cols)
            skips.append(x)
        x = _layer(x, N_SKIP, w, mask_cols)
        for si in range(N_SKIP):
            merged = jnp.concatenate([x, skips[N_SKIP - 1 - si]], axis=-1)
            x = (
                jnp.dot(merged, w.wskip[si].astype(jnp.float32))
                + w.bskip[si].astype(jnp.float32)
            )
            x = _layer(x, N_SKIP + 1 + si, w, mask_cols)
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
        x = x * w.final_scale.astype(jnp.float32) + w.final_bias.astype(jnp.float32)
        eps = x[0:1, :]  # token 0
        c = coeff_ref[pl.ds(i, 1), :]  # (1, 4)
        pred_x0 = (latent - c[0, 1] * eps) * c[0, 0]
        if clip_sample:
            pred_x0 = jnp.clip(pred_x0, -clip_sample_range, clip_sample_range)
        return c[0, 2] * pred_x0 + c[0, 3] * eps

    latent = x0_ref[:]
    latent = jax.lax.fori_loop(0, num_steps, step, latent)
    out_ref[:] = latent


def make_fused_sampler(
    params: dict,
    cfg: DenoiserConfig,
    schedule: DiffusionSchedule,
    num_steps: int = 50,
    interpret: bool = False,
    clip_sample: bool = True,
    clip_sample_range: float = 1.0,
):
    """-> sampler(rng, con, emo, sty) running the whole DDIM loop in-kernel.

    ``clip_sample`` mirrors schedulers.ddim_step (diffusers default True)."""
    packed = pack_denoiser(params)
    n_weights = len(packed)
    kernel = functools.partial(
        _sampler_kernel, num_steps=num_steps,
        clip_sample=clip_sample, clip_sample_range=clip_sample_range,
    )

    def sampler(rng, con, emo, sty):
        time_tokens, cond, coeffs, pos0 = precompute_conditioning(
            params, cfg, schedule, con, emo, sty, num_steps
        )
        b = con.shape[0]
        x0 = jax.random.normal(rng, (b, 1, D), jnp.float32) * schedule.init_noise_sigma

        def one(cond_b, x0_b):
            from amuse_tpu.ops.attention import _vma

            return pl.pallas_call(
                lambda *refs: kernel(
                    refs[0], refs[1], refs[2], refs[3], refs[4],
                    *refs[5 : 5 + n_weights],
                    out_ref=refs[5 + n_weights],
                ),
                # vma propagation: required for pallas_call under shard_map
                # on jax>=0.9 (check_vma), a no-op under plain jit
                out_shape=jax.ShapeDtypeStruct(
                    (1, D), jnp.float32, vma=_vma(cond_b, x0_b, *packed)
                ),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (5 + n_weights),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interpret,
            )(
                time_tokens.astype(jnp.float32),
                cond_b.astype(jnp.float32),
                coeffs.astype(jnp.float32),
                pos0[None].astype(jnp.float32),
                x0_b,
                *packed,
            )

        out = jax.vmap(one)(cond, x0)  # (B, 1, D)
        return out

    return sampler
