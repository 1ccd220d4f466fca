"""Latent diffusion denoiser: epsilon-predictor over the motion latent.

Re-design of the reference ``Denoiser``
(models/latent_diffusion/denoiser.py:16-204, ``trans_enc`` +
``ablation_skip_connection`` arch from configs/diff_latent_v2.json:23-46):

  token sequence = [ noisy latent (1) | time (1) | content (1) |
                     emotion (1) | style (1) ]  ->  9-layer skip-transformer
  prediction     = output token 0

Conditioning embeddings are the frozen AST's 256-d content / emotion / style
features, each ReLU + Linear projected to 128 (denoiser.py:74-79). Timestep
embedding is the diffusers sinusoid (flip_sin_to_cos=True, shift=0) followed
by a Linear-SiLU-Linear MLP (embeddings.py:245-322). Emotion/style streams
can be disabled (ablation lmdb variants, trainer.py:397-401) - the sequence
simply drops those tokens, statically per jit trace.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from amuse_tpu.models.transformer import LearnedPositionalEmbedding, SkipEncoder


@dataclass(frozen=True)
class DenoiserConfig:
    """Knob surface of configs/diff_latent_v2.json:23-46."""

    latent_tokens: int = 1
    latent_dim: int = 128
    ff_size: int = 512
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    cond_dim: int = 256
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    max_len: int = 500
    dtype: jnp.dtype = jnp.float32


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: float = 10_000.0,
) -> jax.Array:
    """Sinusoidal timestep embedding, diffusers semantics (embeddings.py:245-285)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepMLP(nn.Module):
    """Linear -> SiLU -> Linear (embeddings.py:288-305)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="linear_1")(x)
        x = nn.silu(x)
        return nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="linear_2")(x)


class CondProj(nn.Module):
    """ReLU -> Linear conditioning projection (denoiser.py:74-79)."""

    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(
            self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="linear"
        )(nn.relu(x))


class Denoiser(nn.Module):
    cfg: DenoiserConfig = DenoiserConfig()

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,  # (B, latent_tokens, latent_dim) noisy latent
        timesteps: jax.Array,  # (B,) or scalar int
        cond_con: jax.Array,  # (B, cond_dim)
        cond_emo: Optional[jax.Array] = None,
        cond_sty: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        b = sample.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))

        t_sin = timestep_embedding(
            timesteps, cfg.cond_dim, cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(cfg.dtype)
        t_tok = TimestepMLP(cfg.latent_dim, cfg.dtype, name="time_mlp")(t_sin)[:, None, :]

        tokens = [sample.astype(cfg.dtype), t_tok]
        tokens.append(CondProj(cfg.latent_dim, cfg.dtype, name="proj_con")(cond_con.astype(cfg.dtype))[:, None, :])
        if cond_emo is not None:
            tokens.append(CondProj(cfg.latent_dim, cfg.dtype, name="proj_emo")(cond_emo.astype(cfg.dtype))[:, None, :])
        if cond_sty is not None:
            tokens.append(CondProj(cfg.latent_dim, cfg.dtype, name="proj_sty")(cond_sty.astype(cfg.dtype))[:, None, :])
        xseq = jnp.concatenate(tokens, axis=1)  # (B, 2..5, D)
        xseq = LearnedPositionalEmbedding(cfg.latent_dim, cfg.max_len, name="pos")(xseq)
        out = SkipEncoder(
            cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.num_layers,
            cfg.dropout, cfg.activation, cfg.normalize_before, cfg.dtype,
            name="encoder",
        )(xseq, None, deterministic)
        return out[:, : cfg.latent_tokens].astype(jnp.float32)


def init_denoiser_params(rng, cfg: DenoiserConfig) -> dict:
    """Jitted Denoiser init - see vae.init_prior_params for the rationale."""
    denoiser = Denoiser(cfg)
    return jax.jit(denoiser.init)(
        rng,
        jnp.zeros((1, cfg.latent_tokens, cfg.latent_dim)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.cond_dim)),
        jnp.zeros((1, cfg.cond_dim)),
        jnp.zeros((1, cfg.cond_dim)),
    )["params"]
