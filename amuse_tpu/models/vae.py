"""Motion prior: transformer VAE over 300-frame SMPL-X pose windows.

Functional re-design of the reference's ``MotionPrior``
(models/latent_diffusion/vae.py:20-278) with the flagship configuration
(configs/prior_emotional_fing.json + SMPL-X 6D data):

  * input features 333 = 55 joints x 6D + root translation 3
  * latent one token of 128 dims; the encoder prepends two learned
    "distribution tokens" whose outputs are mu and logvar (vae.py:142-213)
  * 9-layer skip-transformer encoder; 9-layer skip-transformer decoder whose
    queries are zero vectors + learned positional embeddings cross-attending
    the single latent token (vae.py:216-278)

Encode and decode are pure functions of (params, inputs, rng) so the whole
stage-2 training step - including the no-grad DDIM monitor pass - lives in
one jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from amuse_tpu.models.transformer import (
    LearnedPositionalEmbedding,
    SkipDecoder,
    SkipEncoder,
    lengths_to_mask,
)


@dataclass(frozen=True)
class PriorConfig:
    """Knob surface of configs/prior_emotional_fing.json:6-20."""

    nfeats: int = 333  # 6D SMPL-X (vae.py:71-73)
    latent_tokens: int = 1
    latent_dim: int = 128
    ff_size: int = 512
    num_layers: int = 9
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    normalize_before: bool = False
    window: int = 300
    max_len: int = 500
    dtype: jnp.dtype = jnp.float32


class MotionPriorEncoder(nn.Module):
    cfg: PriorConfig

    @nn.compact
    def __call__(
        self,
        features: jax.Array,  # (B, T, nfeats)
        lengths: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        b, t, _ = features.shape
        x = nn.Dense(
            cfg.latent_dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="skel_embedding"
        )(features)
        dist_tokens = self.param(
            "dist_tokens",
            nn.initializers.normal(stddev=1.0),  # torch.randn init (vae.py:142)
            (2 * cfg.latent_tokens, cfg.latent_dim),
        )
        tokens = jnp.broadcast_to(
            dist_tokens[None].astype(x.dtype), (b,) + dist_tokens.shape
        )
        xseq = jnp.concatenate([tokens, x], axis=1)  # (B, 2+T, D)
        xseq = LearnedPositionalEmbedding(cfg.latent_dim, cfg.max_len, name="pos")(xseq)
        mask = lengths_to_mask(lengths, b, t)
        if mask is not None:
            mask = jnp.concatenate(
                [jnp.ones((b, 2 * cfg.latent_tokens), bool), mask], axis=1
            )
        out = SkipEncoder(
            cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.num_layers,
            cfg.dropout, cfg.activation, cfg.normalize_before, cfg.dtype,
            name="encoder",
        )(xseq, mask, deterministic)
        mu = out[:, : cfg.latent_tokens]
        logvar = out[:, cfg.latent_tokens : 2 * cfg.latent_tokens]
        return mu.astype(jnp.float32), logvar.astype(jnp.float32)


class MotionPriorDecoder(nn.Module):
    cfg: PriorConfig

    @nn.compact
    def __call__(
        self,
        z: jax.Array,  # (B, latent_tokens, latent_dim)
        frames: Optional[int] = None,
        lengths: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        b = z.shape[0]
        t = frames if frames is not None else cfg.window
        queries = jnp.zeros((b, t, cfg.latent_dim), dtype=cfg.dtype)
        queries = LearnedPositionalEmbedding(cfg.latent_dim, cfg.max_len, name="pos")(queries)
        mask = lengths_to_mask(lengths, b, t)
        out = SkipDecoder(
            cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.num_layers,
            cfg.dropout, cfg.activation, cfg.normalize_before, cfg.dtype,
            name="decoder",
        )(queries, z.astype(cfg.dtype), mask, deterministic)
        feats = nn.Dense(
            cfg.nfeats, dtype=cfg.dtype, param_dtype=jnp.float32, name="final_layer"
        )(out)
        if mask is not None:
            feats = jnp.where(mask[..., None], feats, 0.0)  # zero padded frames
        return feats.astype(jnp.float32)


class MotionPrior(nn.Module):
    """Bundled encoder + decoder with named methods for weight import."""

    cfg: PriorConfig = PriorConfig()

    def setup(self):
        self.encoder = MotionPriorEncoder(self.cfg)
        self.decoder = MotionPriorDecoder(self.cfg)

    def encode_params(self, features, lengths=None, deterministic=True):
        """-> (mu, logvar), each (B, latent_tokens, 128)."""
        return self.encoder(features, lengths, deterministic)

    def encode(self, features, rng, lengths=None, deterministic=True):
        """Reparameterised sample: z = mu + exp(0.5 logvar) * eps (vae.py:211-213)."""
        mu, logvar = self.encoder(features, lengths, deterministic)
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, mu.shape, mu.dtype)
        return mu + std * eps, (mu, logvar)

    def decode(self, z, frames=None, lengths=None, deterministic=True):
        return self.decoder(z, frames, lengths, deterministic)

    def __call__(self, features, rng, lengths=None, deterministic=True):
        """Full autoencode pass; used for init and shape checking."""
        z, (mu, logvar) = self.encode(features, rng, lengths, deterministic)
        feats_rst = self.decode(z, features.shape[1], lengths, deterministic)
        return feats_rst, z, (mu, logvar)


def kl_divergence_normal(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Mean KL(q || N(0,1)) matching torch.distributions.kl_divergence
    (latent_losses.py:252-262): 0.5 * (mu^2 + var - 1 - logvar), averaged.
    """
    return jnp.mean(0.5 * (mu**2 + jnp.exp(logvar) - 1.0 - logvar))


def init_prior_params(rng, cfg: PriorConfig) -> dict:
    """Jitted MotionPrior init (flax eager init is per-primitive dispatch -
    pathological through a remote-compile TPU tunnel). Single authority for
    the init call shape, shared by train/gesture.py and infer/pipeline.py."""
    prior = MotionPrior(cfg)
    return jax.jit(prior.init)(
        rng, jnp.zeros((1, cfg.window, cfg.nfeats)), jax.random.key(0)
    )["params"]
