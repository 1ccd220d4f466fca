"""Legacy raw-pose diffusion model family ("diffusion" tag).

Re-design of the reference's MDM/MLD-style raw baselines
(models/diffusion/bvh_fac/bvh_fac_models.py: PoseMDM / PoseMLD;
diffusion_main.py): a transformer denoiser operating directly on pose
sequences (no latent VAE), conditioned on audio features split into
content/emotion streams, driven by the full Gaussian-diffusion toolkit in
amuse_tpu.diffusion.gaussian. Retained for parity with the reference's
model zoo; the flagship path is the latent LPDM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from amuse_tpu.models.denoiser import TimestepMLP, timestep_embedding
from amuse_tpu.models.transformer import EncoderLayer, LearnedPositionalEmbedding


@dataclass(frozen=True)
class RawDenoiserConfig:
    nfeats: int = 168  # raw axis-angle + trans pose vector
    latent_dim: int = 256
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    cond_dim: int = 256
    window: int = 300
    dtype: jnp.dtype = jnp.float32


class RawPoseDenoiser(nn.Module):
    """MDM-style: tokens = [time+cond | per-frame pose embeddings]."""

    cfg: RawDenoiserConfig = RawDenoiserConfig()

    @nn.compact
    def __call__(
        self,
        x_t: jax.Array,  # (B, T, nfeats) noisy poses
        timesteps: jax.Array,  # (B,)
        cond_con: Optional[jax.Array] = None,  # (B, cond_dim)
        cond_emo: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        b, t, _ = x_t.shape
        dense = lambda f, name: nn.Dense(  # noqa: E731
            f, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        h = dense(cfg.latent_dim, "pose_embd")(x_t.astype(cfg.dtype))

        t_sin = timestep_embedding(timesteps, cfg.latent_dim).astype(cfg.dtype)
        tokens = [TimestepMLP(cfg.latent_dim, cfg.dtype, name="time_mlp")(t_sin)[:, None]]
        if cond_con is not None:
            tokens.append(dense(cfg.latent_dim, "proj_con")(cond_con.astype(cfg.dtype))[:, None])
        if cond_emo is not None:
            tokens.append(dense(cfg.latent_dim, "proj_emo")(cond_emo.astype(cfg.dtype))[:, None])
        n_cond = len(tokens)
        xseq = jnp.concatenate(tokens + [h], axis=1)
        xseq = LearnedPositionalEmbedding(cfg.latent_dim, cfg.window + 8, name="pos")(xseq)
        for i in range(cfg.num_layers):
            xseq = EncoderLayer(
                cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.dropout,
                "gelu", False, cfg.dtype, name=f"layer_{i}",
            )(xseq, None, deterministic)
        out = dense(cfg.nfeats, "pose_proj")(xseq[:, n_cond:])
        return out.astype(jnp.float32)
