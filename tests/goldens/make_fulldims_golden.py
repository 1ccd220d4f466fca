"""Full-dims checkpoint-import rehearsal golden (VERDICT r2 item 5).

Builds a synthetic reference-keyed checkpoint at REAL dims (AST 768/12-layer
x3 encoders incl. patch conv, prior 333-nfeats/9-layer/128-latent, denoiser
9-layer), imports it through amuse_tpu.utils.torch_import, runs the fused
WAV->motion pipeline on one deterministic 10 s chunk, and records a summary
of the output (moments + strided samples). tests/test_full_dims_import.py
replays the same run and compares - any silent change to the import mapping
or the inference math at flagship dims shows up as a golden mismatch.

Regenerate DELIBERATELY (and say why in the commit) after intentional
semantic changes:  python tests/goldens/make_fulldims_golden.py
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).resolve().parent / "fulldims_import.npz"
SEED = 20260817


def run_pipeline():
    """-> (poses (300,55,3), trans (300,3)) from the synthetic full-dims ckpt."""
    import jax
    import jax.numpy as jnp

    from amuse_tpu.infer.pipeline import GesturePipeline, PipelineParams
    from amuse_tpu.models.ast import ASTConfig
    from amuse_tpu.models.denoiser import DenoiserConfig
    from amuse_tpu.models.vae import PriorConfig
    from amuse_tpu.utils import torch_import as ti
    from tests import torch_sd as tsd

    rng = np.random.default_rng(SEED)
    ast_sd: dict = {}
    tsd.disentangler_sd(rng, ast_sd)  # flagship defaults: 768/12, 256 feats
    prior_sd: dict = {}
    tsd.prior_sd(rng, prior_sd)  # 333 nfeats / 128 latent / 9 layers / win 300
    den_sd: dict = {}
    tsd.denoiser_sd(rng, den_sd)  # 128 latent / 9 layers / cond 256

    params = PipelineParams(
        ast=ti.ast_disentangler_from_torch(ast_sd, depth=12),
        prior=ti.motion_prior_from_torch(prior_sd, num_layers=9),
        denoiser=ti.denoiser_from_torch(den_sd, num_layers=9),
    )
    pipe = GesturePipeline(
        params,
        PriorConfig(),
        DenoiserConfig(),
        ASTConfig(),
        dtype=jnp.float32,  # deterministic across hosts; bf16 is a TPU knob
        num_inference_steps=50,
    )
    # one deterministic 10 s chunk of "speech" (tones + noise)
    t = np.arange(160_000) / 16_000.0
    wav = (
        0.25 * np.sin(2 * np.pi * 180 * t)
        + 0.15 * np.sin(2 * np.pi * 923 * t)
        + 0.05 * rng.standard_normal(160_000)
    ).astype(np.float32)
    poses, trans = pipe.wav_to_motion(jax.random.key(7), jnp.asarray(wav)[None])
    return np.asarray(poses)[0], np.asarray(trans)[0]


def summarize(poses: np.ndarray, trans: np.ndarray) -> dict:
    return {
        "poses_mean": np.float32(poses.mean()),
        "poses_std": np.float32(poses.std()),
        "trans_mean": np.float32(trans.mean()),
        "trans_std": np.float32(trans.std()),
        "poses_sample": poses[::50, ::11].astype(np.float32),  # (6, 5, 3)
        "trans_sample": trans[::50].astype(np.float32),  # (6, 3)
    }


def main() -> None:
    poses, trans = run_pipeline()
    assert poses.shape == (300, 55, 3) and trans.shape == (300, 3)
    assert np.isfinite(poses).all() and np.isfinite(trans).all()
    np.savez_compressed(OUT, **summarize(poses, trans))
    print(f"wrote {OUT}: poses mean {poses.mean():.6f} std {poses.std():.6f}")


if __name__ == "__main__":
    main()
