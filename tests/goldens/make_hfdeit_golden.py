"""Installed-HF-DeiT -> AST import rehearsal golden (VERDICT r4 item 6).

The released AMUSE checkpoints initialise each AST encoder from timm's
``deit_base_distilled_patch16_384`` ImageNet weights (reference
models/audio/audio_main_new.py:63-69).  Those weights are not downloadable
in this environment (zero egress), so this golden exercises the closest
real-weights proxy available offline:

  * a REAL ``transformers.DeiTModel`` at the full base-distilled ImageNet
    dims (hidden 768 / 12 layers / 12 heads / image 384 / patch 16 /
    3 channels -> 24x24 grid + cls + dist tokens), instantiated from the
    INSTALLED library so the state-dict key names, shapes and module
    structure are the genuine article;
  * parameter VALUES drawn from a name-keyed deterministic rng and pushed
    through ``load_state_dict`` (strict) - deterministic across
    transformers versions, and any upstream key rename fails loudly here
    rather than silently skewing the import;
  * the FULL ImageNet->AST surgery (``vit_from_imagenet_deit_for_ast``:
    3-channel patch conv summed to 1 channel, 24x24+2 pos-emb middle-cut /
    bilinear-resampled to the 12x101 AST grid) into all THREE AST encoders,
    exactly as the reference seeds con/emo/sty from the same ImageNet init;
  * one 10 s WAV through the fused ``GesturePipeline`` at flagship dims.

tests/test_full_dims_import.py::test_hf_deit_import_matches_golden replays
the run and compares.  Regenerate DELIBERATELY (and say why in the commit):
    python tests/goldens/make_hfdeit_golden.py
"""

from __future__ import annotations

import pathlib
import sys
import zlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

OUT = pathlib.Path(__file__).resolve().parent / "hfdeit_import.npz"
SEED = 20260819
F_DIM, T_DIM = 12, 101  # AST patch grid at (1024, 128) fbank, stride 10


def deterministic_deit():
    """A real installed-transformers DeiTModel at base-distilled-384 dims
    with name-keyed deterministic weights (strict load_state_dict)."""
    import torch
    from transformers import DeiTConfig, DeiTModel

    cfg = DeiTConfig(
        hidden_size=768,
        num_hidden_layers=12,
        num_attention_heads=12,
        intermediate_size=3072,
        image_size=384,
        patch_size=16,
        num_channels=3,
        hidden_act="gelu",
        layer_norm_eps=1e-6,
    )
    model = DeiTModel(cfg, add_pooling_layer=False).eval()
    new_sd = {}
    for name, t in model.state_dict().items():
        r = np.random.default_rng([SEED, zlib.crc32(name.encode())])
        new_sd[name] = torch.from_numpy(
            r.normal(scale=0.02, size=tuple(t.shape)).astype(np.float32)
        )
    model.load_state_dict(new_sd, strict=True)
    return model


def run_pipeline():
    """-> (poses (300,55,3), trans (300,3), con_feature (256,))."""
    import jax
    import jax.numpy as jnp

    from amuse_tpu.infer.pipeline import (
        GesturePipeline,
        PipelineParams,
        init_random_params,
    )
    from amuse_tpu.models.ast import ASTConfig
    from amuse_tpu.models.denoiser import DenoiserConfig
    from amuse_tpu.models.vae import PriorConfig
    from amuse_tpu.utils import torch_import as ti

    sd = ti.state_dict_to_numpy(deterministic_deit().state_dict())
    assert sd["embeddings.position_embeddings"].shape == (1, 24 * 24 + 2, 768)
    vit = ti.vit_from_imagenet_deit_for_ast(sd, depth=12, f_dim=F_DIM, t_dim=T_DIM)

    # heads/fusion/decoder + prior/denoiser at deterministic random init;
    # every encoder's ViT subtree replaced by the ImageNet-surgery import
    # (the reference seeds all three encoders from the same ImageNet init)
    base = init_random_params(
        seed=0, prior_cfg=PriorConfig(), denoiser_cfg=DenoiserConfig(),
        ast_cfg=ASTConfig(), dtype=jnp.float32,
    )
    ast = dict(base.ast)
    for enc in ("emo_enc", "sty_enc", "con_enc"):
        ast[enc] = {**dict(ast[enc]), **vit}
    params = PipelineParams(ast=ast, prior=base.prior, denoiser=base.denoiser)

    pipe = GesturePipeline(
        params, PriorConfig(), DenoiserConfig(), ASTConfig(),
        dtype=jnp.float32, num_inference_steps=50,
    )
    rng = np.random.default_rng(SEED)
    t = np.arange(160_000) / 16_000.0
    wav = (
        0.25 * np.sin(2 * np.pi * 210 * t)
        + 0.15 * np.sin(2 * np.pi * 1311 * t)
        + 0.05 * rng.standard_normal(160_000)
    ).astype(np.float32)
    chunks = jnp.asarray(wav)[None]
    poses, trans = pipe.wav_to_motion(jax.random.key(11), chunks)
    con = pipe.encode_audio(chunks)["con"]
    return np.asarray(poses)[0], np.asarray(trans)[0], np.asarray(con)[0]


def summarize(poses: np.ndarray, trans: np.ndarray, con: np.ndarray) -> dict:
    return {
        "poses_mean": np.float32(poses.mean()),
        "poses_std": np.float32(poses.std()),
        "trans_mean": np.float32(trans.mean()),
        "trans_std": np.float32(trans.std()),
        "poses_sample": poses[::50, ::11].astype(np.float32),  # (6, 5, 3)
        "trans_sample": trans[::50].astype(np.float32),  # (6, 3)
        "con_sample": con[::17].astype(np.float32),
    }


def main() -> None:
    poses, trans, con = run_pipeline()
    assert poses.shape == (300, 55, 3) and trans.shape == (300, 3)
    assert np.isfinite(poses).all() and np.isfinite(trans).all()
    np.savez_compressed(OUT, **summarize(poses, trans, con))
    print(f"wrote {OUT}: poses mean {poses.mean():.6f} std {poses.std():.6f}")


if __name__ == "__main__":
    main()
