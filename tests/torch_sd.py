"""Shared builders for synthetic torch state_dicts (reference key naming).

One source of truth for the torch ``nn.Linear`` / ``LayerNorm`` /
``MultiheadAttention`` / ``TransformerEncoderLayer`` / ``DecoderLayer`` key
layouts the importer consumes - previously duplicated between
test_checkpoint_import.py and test_loaders_extra.py, where the two copies
could drift from the convention independently.
"""

from __future__ import annotations

import numpy as np


def lin(rng: np.random.Generator, prefix: str, din: int, dout: int, sd: dict) -> None:
    sd[f"{prefix}.weight"] = rng.normal(scale=0.05, size=(dout, din)).astype(np.float32)
    sd[f"{prefix}.bias"] = rng.normal(scale=0.05, size=dout).astype(np.float32)


def ln(rng: np.random.Generator, prefix: str, d: int, sd: dict) -> None:
    sd[f"{prefix}.weight"] = np.ones(d, np.float32)
    sd[f"{prefix}.bias"] = np.zeros(d, np.float32)


def mha(rng: np.random.Generator, prefix: str, d: int, sd: dict) -> None:
    sd[f"{prefix}.in_proj_weight"] = rng.normal(scale=0.05, size=(3 * d, d)).astype(np.float32)
    sd[f"{prefix}.in_proj_bias"] = np.zeros(3 * d, np.float32)
    lin(rng, f"{prefix}.out_proj", d, d, sd)


def enc_layer(rng: np.random.Generator, prefix: str, d: int, ff: int, sd: dict) -> None:
    mha(rng, f"{prefix}.self_attn", d, sd)
    lin(rng, f"{prefix}.linear1", d, ff, sd)
    lin(rng, f"{prefix}.linear2", ff, d, sd)
    ln(rng, f"{prefix}.norm1", d, sd)
    ln(rng, f"{prefix}.norm2", d, sd)


def dec_layer(rng: np.random.Generator, prefix: str, d: int, ff: int, sd: dict) -> None:
    mha(rng, f"{prefix}.self_attn", d, sd)
    mha(rng, f"{prefix}.multihead_attn", d, sd)
    lin(rng, f"{prefix}.linear1", d, ff, sd)
    lin(rng, f"{prefix}.linear2", ff, d, sd)
    ln(rng, f"{prefix}.norm1", d, sd)
    ln(rng, f"{prefix}.norm2", d, sd)
    ln(rng, f"{prefix}.norm3", d, sd)


def skip_stack(rng, prefix: str, d: int, ff: int, layers: int, sd: dict,
               decoder: bool = False) -> None:
    """SkipTransformerEncoder/Decoder key layout (cross_attention.py)."""
    n = (layers - 1) // 2
    layer = dec_layer if decoder else enc_layer
    for i in range(n):
        layer(rng, f"{prefix}.input_blocks.{i}", d, ff, sd)
        layer(rng, f"{prefix}.output_blocks.{i}", d, ff, sd)
        lin(rng, f"{prefix}.linear_blocks.{i}", 2 * d, d, sd)
    layer(rng, f"{prefix}.middle_block", d, ff, sd)
    ln(rng, f"{prefix}.norm", d, sd)


def prior_sd(rng, sd: dict, nfeats: int = 333, d: int = 128, ff: int = 512,
             layers: int = 9, window: int = 300) -> None:
    """MotionPrior key layout at given dims (vae.py:93-146 naming)."""
    lin(rng, "skel_embedding", nfeats, d, sd)
    lin(rng, "final_layer", d, nfeats, sd)
    sd["global_motion_token"] = rng.normal(
        scale=0.05, size=(2, d)).astype(np.float32)
    sd["query_pos_encoder.pe"] = rng.normal(
        scale=0.02, size=(max(500, window + 2), 1, d)).astype(np.float32)
    sd["query_pos_decoder.pe"] = rng.normal(
        scale=0.02, size=(max(500, window + 2), 1, d)).astype(np.float32)
    skip_stack(rng, "encoder", d, ff, layers, sd)
    skip_stack(rng, "decoder", d, ff, layers, sd, decoder=True)


def denoiser_sd(rng, sd: dict, d: int = 128, ff: int = 512, layers: int = 9,
                cond: int = 256) -> None:
    """Denoiser key layout at given dims (denoiser.py:64-105 naming)."""
    lin(rng, "time_embedding.linear_1", cond, d, sd)
    lin(rng, "time_embedding.linear_2", d, d, sd)
    lin(rng, "emb_proj_con.1", cond, d, sd)
    lin(rng, "emb_proj_emo.1", cond, d, sd)
    lin(rng, "emb_proj_sty.1", cond, d, sd)
    # PositionEmbeddingLearned1D default max_len=500 (reference
    # position_encoding.py:115) - matches DenoiserConfig.max_len
    sd["query_pos.pe"] = rng.normal(scale=0.02, size=(500, 1, d)).astype(np.float32)
    skip_stack(rng, "encoder", d, ff, layers, sd)


def ast_encoder_sd(rng, prefix: str, sd: dict, embed: int = 768,
                   depth: int = 12, feature_dim: int = 256,
                   label: int = 0, num_patches: int = 1212) -> None:
    """Reference ASTModel key layout at given dims (audio_main_new.py)."""
    sd[f"{prefix}.v.patch_embed.proj.weight"] = rng.normal(
        scale=0.02, size=(embed, 1, 16, 16)).astype(np.float32)
    sd[f"{prefix}.v.patch_embed.proj.bias"] = np.zeros(embed, np.float32)
    sd[f"{prefix}.v.cls_token"] = rng.normal(scale=0.02, size=(1, 1, embed)).astype(np.float32)
    sd[f"{prefix}.v.dist_token"] = rng.normal(scale=0.02, size=(1, 1, embed)).astype(np.float32)
    sd[f"{prefix}.v.pos_embed"] = rng.normal(
        scale=0.02, size=(1, num_patches + 2, embed)).astype(np.float32)
    ln(rng, f"{prefix}.v.norm", embed, sd)
    for i in range(depth):
        bp = f"{prefix}.v.blocks.{i}"
        ln(rng, f"{bp}.norm1", embed, sd)
        lin(rng, f"{bp}.attn.qkv", embed, 3 * embed, sd)
        lin(rng, f"{bp}.attn.proj", embed, embed, sd)
        ln(rng, f"{bp}.norm2", embed, sd)
        lin(rng, f"{bp}.mlp.fc1", embed, 4 * embed, sd)
        lin(rng, f"{bp}.mlp.fc2", 4 * embed, embed, sd)
    ln(rng, f"{prefix}.feature_head.0", embed, sd)
    lin(rng, f"{prefix}.feature_head.1", embed, feature_dim, sd)
    if label:
        ln(rng, f"{prefix}.mlp_head.0", feature_dim, sd)
        lin(rng, f"{prefix}.mlp_head.1", feature_dim, label, sd)
        ln(rng, f"{prefix}.mlp_head_featbased.0", embed, sd)
        lin(rng, f"{prefix}.mlp_head_featbased.1", embed, label, sd)


def disentangler_sd(rng, sd: dict, embed: int = 768, depth: int = 12,
                    feature_dim: int = 256, fusion_dim: int = 512,
                    num_patches: int = 1212, out_frames: int = 1024,
                    out_bins: int = 128) -> None:
    """Reference AST_EVP key layout at given dims (AST_EVP.py:44-65)."""
    ast_encoder_sd(rng, "emo_enc", sd, embed, depth, feature_dim, 8, num_patches)
    ast_encoder_sd(rng, "sty_enc", sd, embed, depth, feature_dim, 30, num_patches)
    ast_encoder_sd(rng, "con_enc", sd, embed, depth, feature_dim, 0, num_patches)
    # Fusion/Decoder transformer layers use the torch default ff=2048
    # (AST_EVP.py:12-42; mirrored in models/ast.py Fusion/DecoderBlock)
    for block, in_dim in (("fusion", feature_dim * 3), ("fusion_ablation", feature_dim * 2)):
        for i in range(2):
            enc_layer(rng, f"{block}.layers.{i}", in_dim, 2048, sd)
        ln(rng, f"{block}.norm", in_dim, sd)
        lin(rng, f"{block}.fc", in_dim, fusion_dim, sd)
    for i in range(4):
        enc_layer(rng, f"decode.layers.{i}", fusion_dim, 2048, sd)
    ln(rng, "decode.norm", fusion_dim, sd)
    lin(rng, "decode.projection.0", fusion_dim, 2 * fusion_dim, sd)
    lin(rng, "decode.projection.2", 2 * fusion_dim, out_frames * out_bins, sd)
