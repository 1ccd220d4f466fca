"""One-way PyTorch -> JAX weight import for the released AMUSE checkpoints.

Maps reference state_dicts onto the flax param trees of this framework:

  * DETR-style encoder/decoder layers (cross_attention.py:236-382):
    packed ``in_proj_weight`` is split into q/k/v kernels, all torch
    ``(out, in)`` weights are transposed to flax ``(in, out)`` kernels.
  * SkipTransformerEncoder/Decoder stacks (cross_attention.py:18-125).
  * MotionPrior (vae.py:93-146), Denoiser (denoiser.py:64-133),
    ASTModel / AST_EVP (audio_main_new.py:37-204, AST_EVP.py:44-65).

Inputs are plain ``{name: np.ndarray}`` dicts; call
:func:`state_dict_to_numpy` on a loaded ``torch.load`` checkpoint first so
the rest of this module has no torch dependency.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

Array = np.ndarray
SD = Mapping[str, Array]


def strip_dataparallel_prefix(sd: Mapping) -> dict:
    """Strip a uniform leading ``module.`` iff EVERY key carries it.

    ``nn.DataParallel`` wraps the whole model, so ``state_dict()`` of a
    wrapped model prefixes every key with ``module.`` - the reference wraps
    its stage-1 audio model exactly so (scripts/trainer.py:203-206) and
    saves the possibly-wrapped ``state_dict()`` (trainer.py:328). Importers
    must tolerate both layouts; the all-keys condition guarantees a bare
    checkpoint (or one with a genuine submodule named ``module`` among
    other top-level keys) passes through untouched.
    """
    if state_dict_is_dataparallel(sd):
        plen = len("module.")
        return {k[plen:]: v for k, v in sd.items()}
    return dict(sd)


def state_dict_is_dataparallel(sd: Mapping) -> bool:
    return bool(sd) and all(k.startswith("module.") for k in sd)


def state_dict_to_numpy(state_dict) -> dict[str, Array]:
    """torch state_dict -> {key: float32 ndarray} (host-side, torch
    optional). Auto-unwraps a DataParallel ``module.`` layout - see
    strip_dataparallel_prefix."""
    out = {}
    for k, v in state_dict.items():
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return strip_dataparallel_prefix(out)


def _t(w: Array) -> Array:
    return np.ascontiguousarray(w.T)


def _linear(sd: SD, prefix: str) -> dict:
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": sd[f"{prefix}.bias"]}


def _layernorm(sd: SD, prefix: str) -> dict:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _mha(sd: SD, prefix: str) -> dict:
    """torch nn.MultiheadAttention -> {q,k,v,out}_proj flax params."""
    w = sd[f"{prefix}.in_proj_weight"]
    b = sd[f"{prefix}.in_proj_bias"]
    e = w.shape[1]
    wq, wk, wv = w[:e], w[e : 2 * e], w[2 * e :]
    bq, bk, bv = b[:e], b[e : 2 * e], b[2 * e :]
    return {
        "q_proj": {"kernel": _t(wq), "bias": bq},
        "k_proj": {"kernel": _t(wk), "bias": bk},
        "v_proj": {"kernel": _t(wv), "bias": bv},
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def encoder_layer_from_torch(sd: SD, prefix: str) -> dict:
    """TransformerEncoderLayer (cross_attention.py:236-294 / torch nn)."""
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "ffn": {
            "linear1": _linear(sd, f"{prefix}.linear1"),
            "linear2": _linear(sd, f"{prefix}.linear2"),
        },
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
    }


def decoder_layer_from_torch(sd: SD, prefix: str) -> dict:
    """TransformerDecoderLayer (cross_attention.py:297-382)."""
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn"),
        "cross_attn": _mha(sd, f"{prefix}.multihead_attn"),
        "ffn": {
            "linear1": _linear(sd, f"{prefix}.linear1"),
            "linear2": _linear(sd, f"{prefix}.linear2"),
        },
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "norm3": _layernorm(sd, f"{prefix}.norm3"),
    }


def skip_encoder_from_torch(sd: SD, prefix: str, num_layers: int = 9) -> dict:
    """SkipTransformerEncoder (cross_attention.py:18-64)."""
    n = (num_layers - 1) // 2
    params = {}
    for i in range(n):
        params[f"in_{i}"] = encoder_layer_from_torch(sd, f"{prefix}.input_blocks.{i}")
        params[f"out_{i}"] = encoder_layer_from_torch(sd, f"{prefix}.output_blocks.{i}")
        params[f"skip_{i}"] = _linear(sd, f"{prefix}.linear_blocks.{i}")
    params["mid"] = encoder_layer_from_torch(sd, f"{prefix}.middle_block")
    params["norm"] = _layernorm(sd, f"{prefix}.norm")
    return params


def skip_decoder_from_torch(sd: SD, prefix: str, num_layers: int = 9) -> dict:
    """SkipTransformerDecoder (cross_attention.py:66-125)."""
    n = (num_layers - 1) // 2
    params = {}
    for i in range(n):
        params[f"in_{i}"] = decoder_layer_from_torch(sd, f"{prefix}.input_blocks.{i}")
        params[f"out_{i}"] = decoder_layer_from_torch(sd, f"{prefix}.output_blocks.{i}")
        params[f"skip_{i}"] = _linear(sd, f"{prefix}.linear_blocks.{i}")
    params["mid"] = decoder_layer_from_torch(sd, f"{prefix}.middle_block")
    params["norm"] = _layernorm(sd, f"{prefix}.norm")
    return params


def motion_prior_from_torch(sd: SD, num_layers: int = 9) -> dict:
    """Reference MotionPrior state_dict -> flax MotionPrior params.

    Reference module names (vae.py:93-146): skel_embedding, final_layer,
    global_motion_token (2, 128), query_pos_encoder.pe / query_pos_decoder.pe
    (max_len, 1, d), encoder.* (skip enc), decoder.* (skip dec).
    """
    return {
        "encoder": {
            "skel_embedding": _linear(sd, "skel_embedding"),
            "dist_tokens": sd["global_motion_token"],
            "pos": {"pe": sd["query_pos_encoder.pe"][:, 0, :]},
            "encoder": skip_encoder_from_torch(sd, "encoder", num_layers),
        },
        "decoder": {
            "pos": {"pe": sd["query_pos_decoder.pe"][:, 0, :]},
            "decoder": skip_decoder_from_torch(sd, "decoder", num_layers),
            "final_layer": _linear(sd, "final_layer"),
        },
    }


def denoiser_from_torch(sd: SD, num_layers: int = 9) -> dict:
    """Reference Denoiser state_dict -> flax Denoiser params.

    Reference module names (denoiser.py:64-105): time_embedding.linear_{1,2},
    emb_proj_{con,emo,sty}.1 (index 1 = the Linear after the ReLU),
    query_pos.pe, encoder.*.
    """
    return {
        "time_mlp": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "proj_con": {"linear": _linear(sd, "emb_proj_con.1")},
        "proj_emo": {"linear": _linear(sd, "emb_proj_emo.1")},
        "proj_sty": {"linear": _linear(sd, "emb_proj_sty.1")},
        "pos": {"pe": sd["query_pos.pe"][:, 0, :]},
        "encoder": skip_encoder_from_torch(sd, "encoder", num_layers),
    }


def _vit_block_from_torch(sd: SD, prefix: str) -> dict:
    """timm ViT Block -> flax ViTBlock params."""
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "qkv": _linear(sd, f"{prefix}.attn.qkv"),
        "attn_proj": _linear(sd, f"{prefix}.attn.proj"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "mlp_fc1": _linear(sd, f"{prefix}.mlp.fc1"),
        "mlp_fc2": _linear(sd, f"{prefix}.mlp.fc2"),
    }


def ast_encoder_from_torch(sd: SD, prefix: str, depth: int = 12, label_dim: int = 0) -> dict:
    """Reference ASTModel -> flax ASTEncoder params.

    The patch Conv2d(1, 768, 16, stride=(10,10)) weight (768, 1, 16, 16)
    becomes the (256, 768) kernel of our patch matmul: pixels flattened
    row-major over (freq, time), matching extract_patches ordering.
    """
    conv_w = sd[f"{prefix}.v.patch_embed.proj.weight"]  # (768, 1, 16, 16)
    kernel = conv_w.reshape(conv_w.shape[0], -1).T  # (256, 768)
    params = {
        "patch_proj": {
            "kernel": np.ascontiguousarray(kernel),
            "bias": sd[f"{prefix}.v.patch_embed.proj.bias"],
        },
        "cls_token": sd[f"{prefix}.v.cls_token"],
        "dist_token": sd[f"{prefix}.v.dist_token"],
        "pos_embed": sd[f"{prefix}.v.pos_embed"],
        "norm": _layernorm(sd, f"{prefix}.v.norm"),
        "feature_ln": _layernorm(sd, f"{prefix}.feature_head.0"),
        "feature_fc": _linear(sd, f"{prefix}.feature_head.1"),
    }
    for i in range(depth):
        params[f"block_{i}"] = _vit_block_from_torch(sd, f"{prefix}.v.blocks.{i}")
    if label_dim:
        params["mlp_ln"] = _layernorm(sd, f"{prefix}.mlp_head.0")
        params["mlp_fc"] = _linear(sd, f"{prefix}.mlp_head.1")
        params["featbased_ln"] = _layernorm(sd, f"{prefix}.mlp_head_featbased.0")
        params["featbased_fc"] = _linear(sd, f"{prefix}.mlp_head_featbased.1")
    return params


def vit_from_hf_deit(sd: SD, depth: int) -> dict:
    """HuggingFace DeiTModel state_dict -> the ViT subtree of ASTEncoder
    params (embeddings + blocks + final norm; feature/label heads are AMUSE
    additions with no HF counterpart).

    Token order matches: HF DeiTEmbeddings concatenates
    [cls, distillation, patches], as does ASTEncoder. HF stores separate
    q/k/v projections; our ViTBlock uses the fused qkv layout, so the three
    kernels are concatenated along the output dim.
    """

    def block(i: int) -> dict:
        p = f"encoder.layer.{i}"
        qkv_w = np.concatenate(
            [sd[f"{p}.attention.attention.{n}.weight"] for n in ("query", "key", "value")],
            axis=0,
        )
        qkv_b = np.concatenate(
            [sd[f"{p}.attention.attention.{n}.bias"] for n in ("query", "key", "value")]
        )
        return {
            "norm1": _layernorm(sd, f"{p}.layernorm_before"),
            "qkv": {"kernel": _t(qkv_w), "bias": qkv_b},
            "attn_proj": _linear(sd, f"{p}.attention.output.dense"),
            "norm2": _layernorm(sd, f"{p}.layernorm_after"),
            "mlp_fc1": _linear(sd, f"{p}.intermediate.dense"),
            "mlp_fc2": _linear(sd, f"{p}.output.dense"),
        }

    conv_w = sd["embeddings.patch_embeddings.projection.weight"]  # (E, C, k, k)
    kernel = conv_w.reshape(conv_w.shape[0], -1).T
    params = {
        "patch_proj": {
            "kernel": np.ascontiguousarray(kernel),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "cls_token": sd["embeddings.cls_token"],
        "dist_token": sd["embeddings.distillation_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "norm": _layernorm(sd, "layernorm"),
    }
    for i in range(depth):
        params[f"block_{i}"] = block(i)
    return params


def _bilinear_resize(x: Array, out_h: int, out_w: int) -> Array:
    """(C, H, W) -> (C, out_h, out_w) bilinear, half-pixel centres
    (torch ``F.interpolate(mode='bilinear', align_corners=False)`` parity;
    pinned against torch in tests/test_checkpoint_import.py)."""
    c, h, w = x.shape

    def grid(out_n: int, in_n: int):
        src = (np.arange(out_n) + 0.5) * (in_n / out_n) - 0.5
        src = np.clip(src, 0.0, in_n - 1.0)
        lo = np.floor(src).astype(np.int64)
        hi = np.minimum(lo + 1, in_n - 1)
        frac = (src - lo).astype(x.dtype)
        return lo, hi, frac

    ylo, yhi, yf = grid(out_h, h)
    xlo, xhi, xf = grid(out_w, w)
    top = x[:, ylo][:, :, xlo] * (1 - xf) + x[:, ylo][:, :, xhi] * xf
    bot = x[:, yhi][:, :, xlo] * (1 - xf) + x[:, yhi][:, :, xhi] * xf
    return top * (1 - yf[None, :, None]) + bot * yf[None, :, None]


def ast_pos_embed_from_imagenet(
    pos_embed: Array, f_dim: int, t_dim: int, orig_hw: int = 24
) -> Array:
    """ImageNet deit pos-emb (1, orig_hw^2 + 2, E) -> AST grid (1, f*t + 2, E).

    Reproduces audio_main_new.py:99-115 exactly: strip the 2 special tokens,
    reshape to (E, 24, 24); per dimension either CUT from the middle (target
    <= 24) or bilinearly interpolate (target > 24) - time first, then
    frequency; re-attach the cls/dist token embeddings unchanged.
    """
    e = pos_embed.shape[-1]
    special, grid = pos_embed[:, :2], pos_embed[:, 2:]
    x = grid.reshape(orig_hw, orig_hw, e).transpose(2, 0, 1)  # (E, 24, 24)
    if t_dim <= orig_hw:
        lo = orig_hw // 2 - t_dim // 2
        x = x[:, :, lo : lo + t_dim]
    else:
        x = _bilinear_resize(x, orig_hw, t_dim)
    if f_dim <= orig_hw:
        lo = orig_hw // 2 - f_dim // 2
        x = x[:, lo : lo + f_dim, :]
    else:
        x = _bilinear_resize(x, f_dim, t_dim)
    flat = x.reshape(e, f_dim * t_dim).T[None]  # (1, f*t, E)
    return np.concatenate([special, flat], axis=1)


def vit_from_imagenet_deit_for_ast(
    sd: SD, depth: int, f_dim: int = 12, t_dim: int = 101
) -> dict:
    """HF DeiT ImageNet weights (3-channel patches, 24x24 grid) -> the ViT
    subtree of ASTEncoder at the AST patch grid.

    The reference's ImageNet-init surgery (audio_main_new.py:90-115):
    the RGB patch conv is SUMMED over input channels to make the 1-channel
    spectrogram conv, and the pos-emb goes through the middle-cut /
    bilinear-interpolation recipe of :func:`ast_pos_embed_from_imagenet`.
    """
    params = vit_from_hf_deit(sd, depth)
    conv_w = sd["embeddings.patch_embeddings.projection.weight"]  # (E, 3, k, k)
    conv_1ch = conv_w.sum(axis=1, keepdims=True)  # (E, 1, k, k)
    params["patch_proj"] = {
        "kernel": np.ascontiguousarray(conv_1ch.reshape(conv_1ch.shape[0], -1).T),
        "bias": sd["embeddings.patch_embeddings.projection.bias"],
    }
    params["pos_embed"] = ast_pos_embed_from_imagenet(
        sd["embeddings.position_embeddings"], f_dim, t_dim
    )
    return params


def _fusion_block_from_torch(sd: SD, prefix: str, num_layers: int) -> dict:
    params = {}
    for i in range(num_layers):
        params[f"layer_{i}"] = encoder_layer_from_torch(sd, f"{prefix}.layers.{i}")
    params["norm"] = _layernorm(sd, f"{prefix}.norm")
    return params


def ast_disentangler_from_torch(sd: SD, depth: int = 12) -> dict:
    """Reference AST_EVP -> flax ASTDisentangler params (AST_EVP.py:44-65)."""
    fusion = _fusion_block_from_torch(sd, "fusion", 2)
    fusion["fc"] = _linear(sd, "fusion.fc")
    fusion_abl = _fusion_block_from_torch(sd, "fusion_ablation", 2)
    fusion_abl["fc"] = _linear(sd, "fusion_ablation.fc")
    decoder = _fusion_block_from_torch(sd, "decode", 4)
    decoder["proj1"] = _linear(sd, "decode.projection.0")
    decoder["proj2"] = _linear(sd, "decode.projection.2")
    return {
        "emo_enc": ast_encoder_from_torch(sd, "emo_enc", depth, label_dim=8),
        "sty_enc": ast_encoder_from_torch(sd, "sty_enc", depth, label_dim=30),
        "con_enc": ast_encoder_from_torch(sd, "con_enc", depth, label_dim=0),
        "fusion": fusion,
        "fusion_ablation": fusion_abl,
        "decoder": decoder,
    }


def strip_module_prefix(sd: SD, prefix: str) -> dict[str, Array]:
    """Select keys under ``prefix.`` and strip it (e.g. 'denoiser.')."""
    plen = len(prefix) + 1
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix + ".")}
