"""Tests for the quantitative gesture metrics."""

import jax.numpy as jnp
import numpy as np

from amuse_tpu.eval import metrics as M


class TestFGD:
    def test_identical_distributions_zero(self):
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(500, 8)), jnp.float32)
        d = float(M.fgd(feats, feats))
        assert abs(d) < 1e-3

    def test_shifted_distribution_positive(self):
        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.normal(size=(500, 8)), jnp.float32)
        b = a + 3.0
        d = float(M.fgd(a, b))
        # mean shift of 3 in 8 dims -> FD >= |mu1-mu2|^2 = 72
        assert 60 < d < 90

    def test_known_1d_gaussians(self):
        # FD^2 between N(0,1) and N(2,4): (0-2)^2 + 1 + 4 - 2*2 = 5
        mu1, c1 = jnp.zeros(1), jnp.ones((1, 1))
        mu2, c2 = jnp.full(1, 2.0), jnp.full((1, 1), 4.0)
        d = float(M.gaussian_frechet_distance(mu1, c1, mu2, c2))
        np.testing.assert_allclose(d, 5.0, rtol=1e-5)


class TestBeatAlignment:
    def test_perfect_alignment(self):
        t = np.asarray([0.5, 1.0, 1.5])
        assert M.beat_alignment(t, t) == 1.0

    def test_misaligned_lower(self):
        m = np.asarray([0.5, 1.0, 1.5])
        a = np.asarray([0.75, 1.25, 1.75])
        s = M.beat_alignment(m, a, sigma=0.1)
        assert 0 < s < 0.2

    def test_empty_inputs(self):
        assert M.beat_alignment(np.zeros(0), np.asarray([1.0])) == 0.0

    def test_motion_beats_finds_speed_minima(self):
        # oscillating joint: speed minima at the turning points
        t = np.linspace(0, 2 * np.pi, 121)
        joints = np.zeros((121, 2, 3))
        joints[:, 0, 0] = np.sin(t)
        beats = M.motion_beats_from_joints(joints, fps=30.0)
        assert len(beats) >= 1
        # the minima must actually sit at the turning points (t = pi/2 and
        # 3pi/2 of the 2pi sweep -> 1/4 and 3/4 through the 4 s clip)
        duration = 120 / 30.0
        expected = np.asarray([duration / 4, 3 * duration / 4])
        for b in np.asarray(beats):
            assert np.min(np.abs(expected - b)) < 0.25, (b, beats)

    def test_audio_beats_from_clicks(self):
        # impulse train at 1 Hz -> onsets near integer seconds
        sr = 16000
        wave = np.zeros(3 * sr, np.float32)
        for s in [sr, 2 * sr]:
            wave[s : s + 200] = 0.9
        beats = M.audio_beats_from_waveform(wave)
        assert len(beats) >= 2
        assert any(abs(b - 1.0) < 0.05 for b in beats)
        assert any(abs(b - 2.0) < 0.05 for b in beats)


class TestDiversityApeAve:
    def test_diversity_zero_for_identical(self):
        feats = jnp.ones((10, 4))
        assert float(M.diversity(feats)) == 0.0

    def test_ape_known_offset(self):
        gt = jnp.zeros((2, 5, 3, 3))
        pred = gt.at[...].set(jnp.asarray([3.0, 0.0, 4.0]))  # L2 = 5 per joint
        np.testing.assert_allclose(float(M.ape(gt, pred)), 5.0, rtol=1e-6)

    def test_ave_zero_same_variance(self):
        rng = np.random.default_rng(2)
        gt = jnp.asarray(rng.normal(size=(2, 50, 3, 3)), jnp.float32)
        np.testing.assert_allclose(float(M.ave(gt, gt)), 0.0, atol=1e-7)


class TestDegenerateInputs:
    def test_fgd_single_sample_is_finite(self):
        import jax.numpy as jnp

        a = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8)), jnp.float32)
        v = float(M.fgd(a, b))
        assert np.isfinite(v)  # was NaN: covariance divided by n-1 = 0
