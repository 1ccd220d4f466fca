"""Legacy CNN audio models (pre-AST "wav_mfcc" tag).

Re-design of the reference's EVP-style convolutional disentanglers
(models/audio/audio_main.py: EmotionNet, AutoEncoder2x;
models/audio/_audio_main_new.py: AutoEncoder3x), registered in its model zoo
under "wav_mfcc" (models/__init__.py:5). Kept for API-surface parity and as
lightweight baselines; the flagship stage-1 model is the AST disentangler.

Operates on MFCC-image inputs (B, T, n_mfcc): a conv encoder tower ->
content + emotion (+ style, 3x variant) latents -> conv decoder reconstructs
the MFCCs; swap losses mirror the AST objective at CNN scale.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
from flax import linen as nn


@dataclass(frozen=True)
class LegacyAudioConfig:
    in_frames: int = 64
    in_coeffs: int = 28
    channels: int = 64
    latent_dim: int = 128
    num_emotions: int = 8
    num_actors: int = 30
    dtype: jnp.dtype = jnp.float32


class ConvEncoder(nn.Module):
    cfg: LegacyAudioConfig
    out_dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = x[..., None].astype(cfg.dtype)  # (B, T, C, 1)
        for i, ch in enumerate([cfg.channels, cfg.channels * 2, cfg.channels * 4]):
            h = nn.Conv(ch, (3, 3), strides=(2, 2), dtype=cfg.dtype, param_dtype=jnp.float32, name=f"conv_{i}")(h)
            h = nn.gelu(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.out_dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="head")(h).astype(jnp.float32)


class ConvDecoder(nn.Module):
    cfg: LegacyAudioConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.cfg
        t0, c0 = cfg.in_frames // 8, cfg.in_coeffs // 4
        h = nn.Dense(t0 * c0 * cfg.channels * 4, dtype=cfg.dtype, param_dtype=jnp.float32, name="in")(z.astype(cfg.dtype))
        h = nn.gelu(h).reshape(z.shape[0], t0, c0, cfg.channels * 4)
        for i, ch in enumerate([cfg.channels * 2, cfg.channels]):
            h = nn.ConvTranspose(ch, (3, 3), strides=(2, 2), dtype=cfg.dtype, param_dtype=jnp.float32, name=f"deconv_{i}")(h)
            h = nn.gelu(h)
        h = nn.ConvTranspose(1, (3, 3), strides=(2, 1), dtype=cfg.dtype, param_dtype=jnp.float32, name="out")(h)
        return h[..., : cfg.in_coeffs, 0].astype(jnp.float32)


class EmotionNet(nn.Module):
    """MFCC -> emotion latent + classification (audio_main.py EmotionNet)."""

    cfg: LegacyAudioConfig = LegacyAudioConfig()

    @nn.compact
    def __call__(self, mfcc: jax.Array):
        z = ConvEncoder(self.cfg, self.cfg.latent_dim, name="enc")(mfcc)
        logits = nn.Dense(self.cfg.num_emotions, param_dtype=jnp.float32, name="cls")(z)
        return z, logits


class AutoEncoder2x(nn.Module):
    """Content/emotion 2-stream conv AE (audio_main.py AutoEncoder2x)."""

    cfg: LegacyAudioConfig = LegacyAudioConfig()

    def setup(self):
        self.con_enc = ConvEncoder(self.cfg, self.cfg.latent_dim)
        self.emo_enc = ConvEncoder(self.cfg, self.cfg.latent_dim)
        self.dec = ConvDecoder(self.cfg)

    def encode(self, mfcc):
        return {"con": self.con_enc(mfcc), "emo": self.emo_enc(mfcc)}

    def decode(self, con, emo):
        return self.dec(jnp.concatenate([con, emo], axis=-1))

    def __call__(self, mfcc):
        z = self.encode(mfcc)
        return self.decode(z["con"], z["emo"]), z


class AutoEncoder3x(nn.Module):
    """Content/emotion/style 3-stream conv AE (_audio_main_new.py)."""

    cfg: LegacyAudioConfig = LegacyAudioConfig()

    def setup(self):
        self.con_enc = ConvEncoder(self.cfg, self.cfg.latent_dim)
        self.emo_enc = ConvEncoder(self.cfg, self.cfg.latent_dim)
        self.sty_enc = ConvEncoder(self.cfg, self.cfg.latent_dim)
        self.dec = ConvDecoder(self.cfg)
        self.emo_cls = nn.Dense(self.cfg.num_emotions, param_dtype=jnp.float32)
        self.sty_cls = nn.Dense(self.cfg.num_actors, param_dtype=jnp.float32)

    def encode(self, mfcc):
        emo = self.emo_enc(mfcc)
        sty = self.sty_enc(mfcc)
        return {
            "con": self.con_enc(mfcc),
            "emo": emo,
            "sty": sty,
            "emo_logits": self.emo_cls(emo),
            "sty_logits": self.sty_cls(sty),
        }

    def decode(self, con, emo, sty):
        return self.dec(jnp.concatenate([con, emo, sty], axis=-1))

    def __call__(self, mfcc):
        z = self.encode(mfcc)
        return self.decode(z["con"], z["emo"], z["sty"]), z
