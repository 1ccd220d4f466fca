"""Audio Spectrogram Transformer encoders + the AMUSE speech disentangler.

Stage-1 of the pipeline (reference: models/audio/AST_EVP.py:44-168,
models/audio/audio_main_new.py:37-204): three ViT-base encoders factor a
(1024, 128) log-mel fbank into 256-d content / emotion / person-style
features, trained with 4 self-reconstructions + 12 cross-reconstruction
swaps over an (actor1, actor2) x (take1, take2) quad plus classification
heads (emotion 8-way, actor 30-way) and a content-alignment L1.

TPU-first re-design choices:
  * the ViT is written for bf16 MXU matmuls (params float32); the patch
    "conv" with kernel 16x16 / stride (10, 10) over a 1-channel spectrogram
    is expressed as patch extraction + one big (B*1212, 256) x (256, 768)
    matmul - identical math to Conv2d, but guaranteed to tile onto the MXU,
  * the reference runs the 16 reconstruction calls sequentially
    (AST_EVP.py:133-157); here the 4 encodes happen once and the 16
    fusion+decoder passes run as ONE batched forward over a stacked
    (16*B) "virtual batch" - same math, one kernel launch,
  * the fusion/decoder transformer layers faithfully reproduce a reference
    quirk: their input is a (B, 768) matrix that torch's unbatched
    TransformerEncoderLayer treats as a length-B *sequence*
    (AST_EVP.py:15,29), i.e. self-attention mixes across the batch. We keep
    that semantic (documented, and batch-size-1 at inference is unaffected).

Architecture constants (ViT deit-base-distilled-384): embed 768, 12 layers,
12 heads, MLP 3072, LayerNorm eps 1e-6, cls + dist tokens whose outputs are
averaged (audio_main_new.py:193).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from amuse_tpu.models.transformer import EncoderLayer

_VIT_LN_EPS = 1e-6


@dataclass(frozen=True)
class ASTConfig:
    input_tdim: int = 1024
    input_fdim: int = 128
    patch: int = 16
    fstride: int = 10
    tstride: int = 10
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: int = 4
    feature_dim: int = 256
    label_dim: int = 0  # 8 emo / 30 sty / 0 con (AST_EVP.py:53-61)
    # Pallas fused attention (amuse_tpu/ops/attention.py): forward-only -
    # for frozen/inference paths (GesturePipeline sets it).
    fused_attention: bool = False
    # Differentiable fused attention (ops/attention.py::mha_train): Pallas
    # forward AND backward (custom VJP), so the (S, S) score matrix never
    # round-trips HBM in either direction. On non-TPU backends it falls
    # back to the XLA reference, so tests/CPU meshes are unaffected.
    # MEASURED on v5e (stage-1 step, batch-1 quad): XLA+remat 202 ms ->
    # fused+no-remat 157 ms (docs/PARITY.md).
    flash_attention: bool = True
    # rematerialize ViT blocks in backward. MEASURED on v5e (stage-1 step,
    # batch 1): with XLA attention remat wins (216 vs 226 ms); with the
    # fused kernel NO-remat wins (168 vs 182 ms) because the custom VJP
    # already recomputes the softmax in VMEM - a second remat replay of the
    # forward kernel is pure waste. Default tracks the fused path.
    remat: bool = False
    # tanh-approximate GELU: opt-in perf knob (default = exact erf, the
    # torch/timm parity choice); see ViTBlock
    gelu_tanh: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def f_patches(self) -> int:
        return (self.input_fdim - self.patch) // self.fstride + 1  # 12

    @property
    def t_patches(self) -> int:
        return (self.input_tdim - self.patch) // self.tstride + 1  # 101

    @property
    def num_patches(self) -> int:
        return self.f_patches * self.t_patches  # 1212


def extract_patches(spec: jax.Array, cfg: ASTConfig) -> jax.Array:
    """(B, T=1024, F=128) fbank -> (B, 1212, 256) overlapping 16x16 patches.

    Matches Conv2d(1, E, 16, stride=(10,10)) on input (B, 1, F, T): patch row
    index runs over frequency, column over time, patch pixels flattened
    row-major over (freq, time) to line up with the conv weight layout.
    """
    x = jnp.swapaxes(spec, -1, -2)  # (B, F, T): freq-major like the reference
    fi = jnp.arange(cfg.f_patches) * cfg.fstride
    ti = jnp.arange(cfg.t_patches) * cfg.tstride
    # gather (B, f_patches, t_patches, patch, patch)
    rows = fi[:, None] + jnp.arange(cfg.patch)[None, :]  # (12, 16)
    cols = ti[:, None] + jnp.arange(cfg.patch)[None, :]  # (101, 16)
    x = x[:, rows]  # (B, 12, 16, T)
    x = x[:, :, :, cols]  # (B, 12, 16, 101, 16)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))  # (B, 12, 101, 16, 16)
    return x.reshape(x.shape[0], cfg.num_patches, cfg.patch * cfg.patch)


class ViTBlock(nn.Module):
    """Pre-norm ViT block (timm): LN -> MHA -> +res; LN -> MLP -> +res."""

    cfg: ASTConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        d = cfg.embed_dim
        dense = lambda feat, name: nn.Dense(  # noqa: E731
            feat, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        h = nn.LayerNorm(epsilon=_VIT_LN_EPS, dtype=cfg.dtype, name="norm1")(x)
        qkv = dense(3 * d, "qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // cfg.num_heads

        def split(t):
            return t.reshape(t.shape[:-1] + (cfg.num_heads, hd))

        q, k, v = split(q), split(k), split(v)
        if cfg.fused_attention or cfg.flash_attention:
            from amuse_tpu.ops.attention import mha as fused_mha
            from amuse_tpu.ops.attention import mha_train

            # explicit fused_attention (inference paths) wins: it skips the
            # custom-VJP machinery the frozen forward never needs
            attn_fn = fused_mha if cfg.fused_attention else mha_train
            o = attn_fn(
                jnp.moveaxis(q, 2, 1), jnp.moveaxis(k, 2, 1), jnp.moveaxis(v, 2, 1)
            )  # (B, H, S, hd)
            o = jnp.moveaxis(o, 1, 2).reshape(x.shape)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(hd, cfg.dtype)
            )
            attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(cfg.dtype)
            o = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(x.shape)
        x = x + dense(d, "attn_proj")(o)

        h = nn.LayerNorm(epsilon=_VIT_LN_EPS, dtype=cfg.dtype, name="norm2")(x)
        h = dense(d * cfg.mlp_ratio, "mlp_fc1")(h)
        # torch nn.GELU default = exact erf (timm 0.4.5 parity). The tanh
        # approximation is an opt-in perf knob (VPU erf is a measurable
        # stage-1 cost, benchmarks/stage1_roofline.py --ablate); max output
        # deviation of tanh-GELU is ~1e-3 absolute on unit-scale inputs.
        h = nn.gelu(h, approximate=cfg.gelu_tanh)
        return x + dense(d, "mlp_fc2")(h)


class ASTEncoder(nn.Module):
    """One AST: fbank (B, 1024, 128) -> 256-d feature (+ optional logits)."""

    cfg: ASTConfig = ASTConfig()

    @nn.compact
    def __call__(
        self,
        spec: jax.Array,
        frame_based_feats: bool = True,
        deterministic: bool = True,
    ) -> dict[str, Optional[jax.Array]]:
        cfg = self.cfg
        b = spec.shape[0]
        patches = extract_patches(spec.astype(cfg.dtype), cfg)
        x = nn.Dense(
            cfg.embed_dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="patch_proj"
        )(patches)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.embed_dim))
        dist = self.param("dist_token", nn.initializers.zeros, (1, 1, cfg.embed_dim))
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(stddev=0.02),
            (1, cfg.num_patches + 2, cfg.embed_dim),
        )
        tok = jnp.broadcast_to(cls.astype(x.dtype), (b, 1, cfg.embed_dim))
        dtk = jnp.broadcast_to(dist.astype(x.dtype), (b, 1, cfg.embed_dim))
        x = jnp.concatenate([tok, dtk, x], axis=1) + pos.astype(x.dtype)

        block_cls = nn.remat(ViTBlock) if cfg.remat else ViTBlock
        for i in range(cfg.depth):
            x = block_cls(cfg, name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=_VIT_LN_EPS, dtype=cfg.dtype, name="norm")(x)

        x_dist = 0.5 * (x[:, 0] + x[:, 1])  # audio_main_new.py:193

        def feature_head(h):
            h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="feature_ln")(h)
            return nn.Dense(
                cfg.feature_dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="feature_fc"
            )(h)

        if frame_based_feats:
            # mean over patch tokens (audio_main_new.py:195-197)
            features = feature_head(jnp.mean(x[:, 2:], axis=1))
            logits = None
            if cfg.label_dim:
                h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="featbased_ln")(x_dist)
                logits = nn.Dense(
                    cfg.label_dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="featbased_fc"
                )(h)
        else:
            features = feature_head(x_dist)
            logits = None
            if cfg.label_dim:
                h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="mlp_ln")(features)
                logits = nn.Dense(
                    cfg.label_dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="mlp_fc"
                )(h)
        return {
            "feature": features.astype(jnp.float32),
            "logits": None if logits is None else logits.astype(jnp.float32),
        }


class FusionBlock(nn.Module):
    """2 transformer layers over the batch-as-sequence + LN + Linear.

    Reference quirk preserved (AST_EVP.py:12-24): input (B, in_dim) is run
    through torch TransformerEncoderLayers as an *unbatched sequence of
    length B* (d_model=in_dim, 4 heads, ff 2048, ReLU, post-norm).
    """

    in_dim: int
    out_dim: int
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        # (B, in) -> one length-B sequence; (G, B, in) -> G independent
        # sequences (the training step batches all 16 swap groups into one
        # call while preserving the per-call reference semantics).
        squeeze = x.ndim == 2
        h = x[None] if squeeze else x
        for i in range(self.num_layers):
            h = EncoderLayer(
                self.in_dim, 4, 2048, 0.1, "relu", False, self.dtype, name=f"layer_{i}"
            )(h, None, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc")(h)
        return h[0] if squeeze else h


class DecoderBlock(nn.Module):
    """4 transformer layers + LN + MLP projecting latent -> full fbank.

    (AST_EVP.py:26-42): Linear(512 -> 1024) ReLU Linear(1024 -> 1024*128).
    """

    in_dim: int = 512
    out_frames: int = 1024
    out_bins: int = 128
    num_layers: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        squeeze = x.ndim == 2
        h = x[None] if squeeze else x
        for i in range(self.num_layers):
            h = EncoderLayer(
                self.in_dim, 4, 2048, 0.1, "relu", False, self.dtype, name=f"layer_{i}"
            )(h, None, deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(self.in_dim * 2, dtype=self.dtype, param_dtype=jnp.float32, name="proj1")(h)
        h = nn.relu(h)
        h = nn.Dense(
            self.out_frames * self.out_bins,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="proj2",
        )(h)
        h = h.reshape(h.shape[:-1] + (self.out_frames, self.out_bins))
        return h[0] if squeeze else h


class ASTDisentangler(nn.Module):
    """The stage-1 triple-encoder disentangler (reference AST_EVP).

    Methods:
      * ``encode``       - fbank -> {con, emo, sty} features (+ logits)
      * ``reconstruct``  - concatenated features -> fbank via fusion+decoder
      * ``__call__``     - a single full pass (init/shape checking)

    The 16-way swap training objective lives in amuse_tpu.train.audio (it is
    a pure function of four ``encode`` outputs + batched ``reconstruct``).
    """

    dtype: jnp.dtype = jnp.float32
    base_cfg: ASTConfig = ASTConfig()
    fusion_dim: int = 512

    def setup(self):
        import dataclasses

        base = dataclasses.replace(self.base_cfg, dtype=self.dtype)
        self.emo_enc = ASTEncoder(dataclasses.replace(base, label_dim=8))
        self.sty_enc = ASTEncoder(dataclasses.replace(base, label_dim=30))
        self.con_enc = ASTEncoder(dataclasses.replace(base, label_dim=0))
        self.fusion = FusionBlock(base.feature_dim * 3, self.fusion_dim, dtype=self.dtype)
        self.fusion_ablation = FusionBlock(base.feature_dim * 2, self.fusion_dim, dtype=self.dtype)
        self.decoder = DecoderBlock(
            in_dim=self.fusion_dim,
            out_frames=base.input_tdim,
            out_bins=base.input_fdim,
            dtype=self.dtype,
        )

    def encode(self, spec, frame_based_feats=True, deterministic=True):
        emo = self.emo_enc(spec, frame_based_feats, deterministic)
        sty = self.sty_enc(spec, frame_based_feats, deterministic)
        con = self.con_enc(spec, frame_based_feats, deterministic)
        return {"emo": emo, "sty": sty, "con": con}

    def reconstruct(self, feats_concat, deterministic=True):
        """(B, 768) [emo|sty|con] features -> (B, 1024, 128) fbank."""
        latent = self.fusion(feats_concat, deterministic)
        return self.decoder(latent, deterministic)

    def reconstruct_ablation(self, feats_concat, deterministic=True):
        """(B, 512) [emo-or-sty|con] -> fbank (2-stream ablations)."""
        latent = self.fusion_ablation(feats_concat, deterministic)
        return self.decoder(latent, deterministic)

    def __call__(self, spec, frame_based_feats=True, deterministic=True):
        enc = self.encode(spec, frame_based_feats, deterministic)
        cat = jnp.concatenate(
            [enc["emo"]["feature"], enc["sty"]["feature"], enc["con"]["feature"]],
            axis=-1,
        )
        fbanks = self.reconstruct(cat, deterministic)
        fd = self.base_cfg.feature_dim
        _ = self.reconstruct_ablation(cat[:, : 2 * fd], deterministic)  # init params
        return fbanks, enc
