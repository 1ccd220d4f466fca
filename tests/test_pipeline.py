"""End-to-end inference pipeline tests (small model configs, CPU)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amuse_tpu.models.ast import ASTConfig
from amuse_tpu.models.denoiser import DenoiserConfig
from amuse_tpu.models.vae import PriorConfig
from amuse_tpu.infer.pipeline import GesturePipeline, init_random_params

# Tiny-but-real configs: full 1024x128 fbank input (so the audio front-end is
# exercised verbatim), shallow/narrow transformer stacks for CPU speed.
AST_SMALL = ASTConfig(embed_dim=16, depth=1, num_heads=2, feature_dim=24)
PRIOR_SMALL = PriorConfig(nfeats=333, latent_dim=16, ff_size=32, num_layers=3, num_heads=2, window=30)
DEN_SMALL = DenoiserConfig(latent_dim=16, ff_size=32, num_layers=3, num_heads=2, cond_dim=24)


@pytest.fixture(scope="module")
def pipe():
    params = init_random_params(0, PRIOR_SMALL, DEN_SMALL, AST_SMALL, dtype=jnp.float32)
    return GesturePipeline(
        params, PRIOR_SMALL, DEN_SMALL, AST_SMALL,
        dtype=jnp.float32, num_inference_steps=4,
    )


class TestPipeline:
    def test_wav_to_motion_shapes(self, pipe):
        chunks = jnp.asarray(
            np.random.default_rng(0).normal(scale=0.05, size=(2, 160000)), jnp.float32
        )
        poses, trans = pipe.wav_to_motion(jax.random.key(0), chunks)
        assert poses.shape == (2, 30, 55, 3)
        assert trans.shape == (2, 30, 3)
        assert bool(jnp.all(jnp.isfinite(poses)))

    def test_encode_audio_features(self, pipe):
        chunks = jnp.asarray(
            np.random.default_rng(1).normal(scale=0.05, size=(1, 160000)), jnp.float32
        )
        cond = pipe.encode_audio(chunks)
        assert cond["con"].shape == cond["emo"].shape == cond["sty"].shape == (1, 24)

    def test_determinism_given_seed(self, pipe):
        chunks = jnp.asarray(
            np.random.default_rng(2).normal(scale=0.05, size=(1, 160000)), jnp.float32
        )
        a = pipe.wav_to_motion(jax.random.key(5), chunks)
        b = pipe.wav_to_motion(jax.random.key(5), chunks)
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))

    def test_emotion_conditioning_changes_output(self, pipe):
        con = jnp.ones((1, 24))
        sty = jnp.ones((1, 24))
        z1 = pipe.generate_latents(jax.random.key(0), con, jnp.zeros((1, 24)), sty)
        z2 = pipe.generate_latents(jax.random.key(0), con, jnp.ones((1, 24)) * 3, sty)
        assert not np.allclose(np.asarray(z1), np.asarray(z2))

    def test_infer_wav_and_export(self, pipe, tmp_path):
        from amuse_tpu.viz.export import export_windows

        wave = np.random.default_rng(3).normal(scale=0.05, size=340000).astype(np.float32)
        result = pipe.infer_wav(wave)
        assert result["poses"].shape == (2, 30, 55, 3)
        # jaw zeroed for export
        assert np.abs(result["poses"][:, :, 22]).sum() == 0.0
        paths = export_windows(tmp_path, result, subject="scott")
        assert len(paths) == 2
        d = np.load(paths[0])
        assert d["poses"].shape == (30, 55, 3)
        assert d["trans"].shape == (30, 3)
        assert str(d["gender"]) == "male"
        assert d["betas"].shape == (300,)
        assert float(d["mocap_frame_rate"]) == 30.0


class TestEditing:
    def test_demo_emotion_swap(self, pipe):
        from amuse_tpu.infer.editing import demo_emotion_swap

        rng = np.random.default_rng(4)
        src = rng.normal(scale=0.05, size=170000).astype(np.float32)
        tgt = rng.normal(scale=0.08, size=170000).astype(np.float32)
        out = demo_emotion_swap(pipe, src, tgt)
        assert set(out) == {"original", "emotion_swapped"}
        poses_a, _ = out["original"]
        poses_b, _ = out["emotion_swapped"]
        assert poses_a.shape == poses_b.shape == (1, 30, 55, 3)
        assert not np.allclose(poses_a, poses_b)

    def test_emotion_control_task(self, pipe):
        from amuse_tpu.infer.editing import TakeLatents, emotion_control

        rng = np.random.default_rng(5)
        takes = [
            TakeLatents(
                "scott", t, i,
                rng.normal(size=(1, 24)).astype(np.float32),
                rng.normal(size=(1, 24)).astype(np.float32),
                rng.normal(size=(1, 24)).astype(np.float32),
            )
            for i, t in enumerate(["0_9_9", "0_65_65"])
        ]
        out = emotion_control(pipe, takes)
        assert set(out) == {"scott_0_9_9", "scott_0_65_65"}
        assert set(out["scott_0_9_9"]) == {"self", "emo_0_65_65"}
