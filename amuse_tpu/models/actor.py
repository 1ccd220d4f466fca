"""ACTOR-style motion transformer AE (reference: Actor_transformers.py).

The reference vendors ACTOR's Encoder_TRANSFORMER / Decoder_TRANSFORMER and
an ``ACTOR_AE`` wrapper (models/latent_diffusion/utils/Actor_transformers.py:
42-306). It is exported from ``models/latent_diffusion/__init__.py`` but
unused by the six CLI tasks; it is kept here for component parity.

Faithful semantics of the *final-model* code paths:
  * Encoder (`ablation=None`, the default): a per-class learned mu query
    token is prepended to the skeleton-embedded sequence, sinusoidal
    positional encoding, post-norm torch encoder layers; mu = the query
    token's output (Actor_transformers.py:116-131).
  * ``ACTOR_AE``: z = mu (deterministic; the VAE reparameterization branch
    raises "Not part of the final model!" upstream, :285-305), an MLP
    classification head 256->128->64->num_classes, cross-entropy loss; the
    decoder/reconstruction is disabled (recon_loss fixed at 0, :273-283).
  * Decoder: zero time-query sequence + sinusoidal positions cross-attends
    the single latent memory token; the reference REMOVES ACTOR's
    action-bias shift ("completely removing the action label information",
    :208-211). Provided because the class exists upstream, wired into
    ``ActorAE.decode`` for completeness.

TPU notes: pure static shapes, post-norm layers shared with the rest of the
model zoo (amuse_tpu/models/transformer.py, torch-parity pinned).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from amuse_tpu.models.transformer import DecoderLayer, EncoderLayer


@dataclass(frozen=True)
class ActorConfig:
    njoints: int = 47
    nfeats: int = 6
    num_frames: int = 300
    num_classes: int = 8  # 8 emotions (or 30 personalities upstream)
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"

    @property
    def input_feats(self) -> int:
        return self.njoints * self.nfeats


def sinusoidal_positions(length: int, dim: int) -> np.ndarray:
    """Classic Vaswani table (reference PositionalEncoding, :7-26)."""
    pos = np.arange(length, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float64) * (-np.log(10000.0) / dim))
    pe = np.zeros((length, dim), dtype=np.float64)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: pe[:, 1::2].shape[1]])
    return pe.astype(np.float32)


class ActorEncoder(nn.Module):
    """(B, T, J*F) motion + (B,) class -> mu (B, latent_dim)."""

    cfg: ActorConfig = ActorConfig()

    @nn.compact
    def __call__(
        self, x: jax.Array, y: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        cfg = self.cfg
        h = nn.Dense(cfg.latent_dim, name="skel_embedding")(x)  # (B, T, D)
        mu_query = self.param(
            "mu_query",
            nn.initializers.normal(1.0),
            (cfg.num_classes, cfg.latent_dim),
        )
        mq = mu_query[y][:, None, :]  # (B, 1, D): per-class token
        seq = jnp.concatenate([mq, h], axis=1)
        pe = sinusoidal_positions(seq.shape[1], cfg.latent_dim)
        seq = seq + jnp.asarray(pe)[None]
        seq = nn.Dropout(cfg.dropout)(seq, deterministic=deterministic)
        for i in range(cfg.num_layers):
            seq = EncoderLayer(
                cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.dropout,
                cfg.activation, False, name=f"layer_{i}",
            )(seq, None, deterministic)
        return seq[:, 0]  # the mu query's output


class ActorDecoder(nn.Module):
    """latent (B, D) -> motion (B, T, J*F) via zero time queries."""

    cfg: ActorConfig = ActorConfig()

    @nn.compact
    def __call__(
        self, z: jax.Array, nframes: int | None = None, deterministic: bool = True
    ) -> jax.Array:
        cfg = self.cfg
        t = nframes or cfg.num_frames
        b = z.shape[0]
        queries = jnp.zeros((b, t, cfg.latent_dim), z.dtype)
        queries = queries + jnp.asarray(sinusoidal_positions(t, cfg.latent_dim))[None]
        queries = nn.Dropout(cfg.dropout)(queries, deterministic=deterministic)
        memory = z[:, None, :]  # single latent token; NO action bias shift
        h = queries
        for i in range(cfg.num_layers):
            h = DecoderLayer(
                cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.dropout,
                cfg.activation, False, name=f"layer_{i}",
            )(h, memory, None, None, deterministic)
        return nn.Dense(cfg.input_feats, name="final")(h)


class ActorAE(nn.Module):
    """The reference ACTOR_AE: encode -> z=mu -> classify; recon disabled."""

    cfg: ActorConfig = ActorConfig()

    def setup(self):
        self.encoder = ActorEncoder(self.cfg)
        self.decoder = ActorDecoder(self.cfg)
        self.cls_fc1 = nn.Dense(128, name="cls_fc1")
        self.cls_fc2 = nn.Dense(64, name="cls_fc2")
        self.cls_out = nn.Dense(self.cfg.num_classes, name="cls_out")

    def classify(self, z: jax.Array) -> jax.Array:
        h = nn.relu(self.cls_fc1(z))
        h = nn.relu(self.cls_fc2(h))
        return self.cls_out(h)

    def decode(self, z: jax.Array, nframes: int | None = None,
               deterministic: bool = True) -> jax.Array:
        return self.decoder(z, nframes, deterministic)

    def __call__(
        self, x: jax.Array, emo_label: jax.Array, deterministic: bool = True
    ) -> dict:
        z = self.encoder(x, emo_label, deterministic)  # z = mu, no sampling
        logits = self.classify(z)
        logp = jax.nn.log_softmax(logits, axis=-1)
        class_loss = -jnp.mean(
            jnp.take_along_axis(logp, emo_label[:, None], axis=-1)
        )
        return {
            "z": z,
            "predicted_labels": logits,
            "prediction": jax.nn.softmax(logits, axis=-1),
            "recon_loss": jnp.zeros((), jnp.float32),  # upstream fixes it at 0
            "class_loss": class_loss,
        }
