"""Eval runner test over a synthetic cache + tiny pipeline."""

import json

import jax.numpy as jnp
import numpy as np

from amuse_tpu.eval.runner import evaluate_cache
from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params
from amuse_tpu.models.ast import ASTConfig
from amuse_tpu.models.denoiser import DenoiserConfig
from amuse_tpu.models.vae import PriorConfig


class FakeCache:
    def __init__(self, n=8, cond=12, window=30):
        rng = np.random.default_rng(0)
        self.items = [
            {
                "motion": (0.1 * rng.normal(size=(window, 168))).astype(np.float32),
                "con": rng.normal(size=cond).astype(np.float32),
                "emo": rng.normal(size=cond).astype(np.float32),
                "sty": rng.normal(size=cond).astype(np.float32),
                "actor_id": np.int32(1),  # scott (0-based)
            }
            for _ in range(n)
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def test_evaluate_cache_reports_metrics():
    prior = PriorConfig(nfeats=333, latent_dim=16, ff_size=32, num_layers=3, num_heads=2, window=30)
    den = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3, num_heads=2, cond_dim=12)
    ast = ASTConfig(embed_dim=16, depth=1, num_heads=2, feature_dim=12)
    params = init_random_params(0, prior, den, ast, dtype=jnp.float32)
    pipe = GesturePipeline(params, prior, den, ast, dtype=jnp.float32, num_inference_steps=3)

    results = evaluate_cache(pipe, FakeCache(), batch_size=4)
    for k in ("fgd", "diversity_real", "diversity_gen", "ape", "ave"):
        assert k in results and np.isfinite(results[k]), (k, results)
    assert results["num_windows"] == 8
    assert results["metric_space"] == "rotation"
    json.dumps(results)  # serialisable


def test_evaluate_cache_position_space_with_smplx():
    """With a body model, APE/AVE/beat-align run on FK joint positions
    (reference semantics: MLD position-space metrics, latent_losses.py
    joint/vertex space) - not on raw rotations."""
    from amuse_tpu.core import smplx as smplx_mod

    prior = PriorConfig(nfeats=333, latent_dim=16, ff_size=32, num_layers=3, num_heads=2, window=30)
    den = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3, num_heads=2, cond_dim=12)
    ast = ASTConfig(embed_dim=16, depth=1, num_heads=2, feature_dim=12)
    params = init_random_params(0, prior, den, ast, dtype=jnp.float32)
    pipe = GesturePipeline(params, prior, den, ast, dtype=jnp.float32, num_inference_steps=3)
    model = smplx_mod.make_test_model(num_vertices=32, num_joints=55, num_betas=8)

    rot = evaluate_cache(pipe, FakeCache(), batch_size=4)
    pos = evaluate_cache(pipe, FakeCache(), batch_size=4, smplx_model=model)
    assert pos["metric_space"] == "position"
    for k in ("ape", "ave"):
        assert np.isfinite(pos[k])
        # position-space numbers differ from rotation-space ones
        assert pos[k] != rot[k], k
