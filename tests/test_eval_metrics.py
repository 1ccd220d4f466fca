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


class TestFGDOracle:
    """Pin gaussian_frechet_distance against scipy.linalg.sqrtm (the
    canonical FID construction) — round-3 verdict item 4."""

    def _scipy_fd(self, mu1, c1, mu2, c2):
        import scipy.linalg

        covmean = scipy.linalg.sqrtm(np.asarray(c1, np.float64) @ np.asarray(c2, np.float64))
        if np.iscomplexobj(covmean):  # numerical fuzz off the PSD cone
            covmean = covmean.real
        d = np.sum((np.asarray(mu1) - np.asarray(mu2)) ** 2)
        return float(d + np.trace(c1) + np.trace(c2) - 2.0 * np.trace(covmean))

    def test_matches_scipy_on_noncommuting_covariances(self):
        # random full-rank PSD covariances that do NOT commute: the
        # eigh-based sqrt(C1^{1/2} C2 C1^{1/2}) trace must still equal
        # tr sqrtm(C1 C2) (similar matrices, same eigenvalues)
        for seed in range(5):
            rng = np.random.default_rng(seed)
            d = 8
            a = rng.normal(size=(d, d))
            b = rng.normal(size=(d, d))
            c1 = a @ a.T + 0.1 * np.eye(d)
            c2 = b @ b.T + 0.1 * np.eye(d)
            mu1 = rng.normal(size=d)
            mu2 = rng.normal(size=d)
            got = float(
                M.gaussian_frechet_distance(
                    jnp.asarray(mu1), jnp.asarray(c1), jnp.asarray(mu2), jnp.asarray(c2)
                )
            )
            want = self._scipy_fd(mu1, c1, mu2, c2)
            np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_full_fgd_matches_scipy_pipeline(self):
        rng = np.random.default_rng(42)
        real = rng.normal(size=(300, 6))
        gen = 1.3 * rng.normal(size=(250, 6)) + 0.5
        got = float(M.fgd(jnp.asarray(real, jnp.float32), jnp.asarray(gen, jnp.float32)))
        want = self._scipy_fd(
            real.mean(0), np.cov(real, rowvar=False), gen.mean(0), np.cov(gen, rowvar=False)
        )
        np.testing.assert_allclose(got, want, rtol=1e-3)


class TestFGDCalibration:
    """FGD must behave like a distance on realistic feature sets."""

    def test_permuted_real_set_is_zero(self):
        rng = np.random.default_rng(0)
        feats = rng.normal(size=(400, 16)).astype(np.float32)
        perm = feats[rng.permutation(400)]
        assert float(M.fgd(jnp.asarray(feats), jnp.asarray(perm))) < 1e-3

    def test_split_halves_near_zero_vs_noise(self):
        # two independent halves of one distribution score ~sampling noise;
        # a corrupted set must score far above that floor
        rng = np.random.default_rng(1)
        feats = rng.normal(size=(2000, 8)).astype(np.float32)
        floor = float(M.fgd(jnp.asarray(feats[:1000]), jnp.asarray(feats[1000:])))
        noisy = feats[1000:] + 1.0 * rng.normal(size=(1000, 8)).astype(np.float32)
        assert float(M.fgd(jnp.asarray(feats[:1000]), jnp.asarray(noisy))) > 10 * floor

    def test_monotone_in_injected_noise(self):
        rng = np.random.default_rng(2)
        real = rng.normal(size=(500, 12)).astype(np.float32)
        gen = rng.normal(size=(500, 12)).astype(np.float32)
        noise = rng.normal(size=(500, 12)).astype(np.float32)
        vals = [
            float(M.fgd(jnp.asarray(real), jnp.asarray(gen + s * noise)))
            for s in (0.0, 0.5, 1.0, 2.0)
        ]
        assert vals == sorted(vals), vals


class TestBeatDetectorOracles:
    """Pin the production detectors against the third-party reconstructions
    (tests/thirdparty/librosa_onset.py) — the fbank-oracle discipline."""

    def test_peak_pick_matches_librosa_reconstruction(self):
        from tests.thirdparty import librosa_onset as LO

        params = LO.onset_detect_default_params(sr=16000, hop_length=160)
        # the production defaults ARE onset_detect's defaults at 10 ms hop
        assert params == dict(
            pre_max=3, post_max=1, pre_avg=10, post_avg=11, wait=3, delta=0.07
        )
        for seed in range(8):
            rng = np.random.default_rng(seed)
            env = np.abs(rng.normal(size=200)) * rng.uniform(0, 2)
            want = LO.peak_pick(env, **params)
            got = M.pick_peaks(env, **params)
            np.testing.assert_array_equal(got, want, err_msg=f"seed {seed}")
            assert want.size > 0  # the comparison must not be vacuous

    def test_onset_envelope_matches_reconstruction(self):
        from tests.thirdparty import librosa_onset as LO

        rng = np.random.default_rng(3)
        ln_mel = rng.normal(size=(50, 128))  # natural-log mel (fbank space)
        mel_db = ln_mel * (10.0 / np.log(10.0))
        want = LO.onset_strength_from_mel_db(mel_db)
        got = M.onset_envelope(ln_mel)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_motion_beats_match_aistpp_construction(self):
        from tests.thirdparty import librosa_onset as LO

        rng = np.random.default_rng(4)
        # smooth-ish random motion so minima are generic (no plateaus)
        joints = np.cumsum(rng.normal(size=(120, 5, 3)), axis=0) * 0.01
        # fps=60 -> order 10, exactly Li et al.'s published setting
        want_idx = LO.kinematic_beats_aistpp(joints, order=10)
        got = M.motion_beats_from_joints(joints, fps=60.0)
        np.testing.assert_allclose(got, (want_idx + 1) / 60.0, rtol=1e-12)
        assert want_idx.size > 0


class TestDegenerateInputs:
    def test_fgd_single_sample_is_finite(self):
        import jax.numpy as jnp

        a = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8)), jnp.float32)
        b = jnp.asarray(np.random.default_rng(1).normal(size=(1, 8)), jnp.float32)
        v = float(M.fgd(a, b))
        assert np.isfinite(v)  # was NaN: covariance divided by n-1 = 0


class TestRPrecision:
    """TM2T retrieval metrics vs an independent numpy reconstruction of the
    reference's dead val_metrics.py:277-316 (grouping, trace matching score,
    argsort top-k)."""

    @staticmethod
    def _numpy_oracle(cond, motion, r_size, top_k, perm):
        n_groups = cond.shape[0] // r_size
        keep = perm[: n_groups * r_size]
        c, m = cond[keep], motion[keep]
        match, topk = 0.0, np.zeros(top_k)
        for i in range(n_groups):
            gc = c[i * r_size:(i + 1) * r_size]
            gm = m[i * r_size:(i + 1) * r_size]
            dist = np.sqrt(
                np.maximum(
                    (gc * gc).sum(1)[:, None] - 2 * gc @ gm.T + (gm * gm).sum(1)[None],
                    0.0,
                )
            )
            match += np.trace(dist)
            order = np.argsort(dist, axis=1)  # upstream argsort + calculate_top_k
            for row in range(r_size):
                rank = int(np.where(order[row] == row)[0][0])
                for k in range(top_k):
                    if rank <= k:
                        topk[k] += 1
        r_count = n_groups * r_size
        out = {"matching_score": match / r_count, "r_count": float(r_count)}
        for k in range(top_k):
            out[f"r_precision_top_{k + 1}"] = topk[k] / r_count
        return out

    def test_matches_numpy_oracle(self):
        rng = np.random.default_rng(7)
        n, d, r_size, seed = 70, 16, 32, 3
        cond = rng.normal(size=(n, d)).astype(np.float32)
        # correlated motion so retrieval is non-trivial but imperfect
        motion = (cond + rng.normal(scale=1.0, size=(n, d))).astype(np.float32)
        got = M.r_precision_suite(
            jnp.asarray(cond), jnp.asarray(motion), r_size=r_size, seed=seed
        )
        perm = np.random.default_rng(seed).permutation(n)
        want = self._numpy_oracle(cond, motion, r_size, 3, perm)
        assert got["r_count"] == want["r_count"] == 64.0  # tail of 6 dropped
        np.testing.assert_allclose(
            got["matching_score"], want["matching_score"], rtol=1e-5
        )
        for k in (1, 2, 3):
            assert got[f"r_precision_top_{k}"] == want[f"r_precision_top_{k}"]

    def test_perfect_embeddings_top1(self):
        rng = np.random.default_rng(1)
        e = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
        out = M.r_precision_suite(e, e, r_size=32)
        assert out["r_precision_top_1"] == 1.0
        assert out["matching_score"] < 1e-3

    def test_independent_embeddings_near_chance(self):
        rng = np.random.default_rng(2)
        cond = jnp.asarray(rng.normal(size=(512, 8)), jnp.float32)
        motion = jnp.asarray(rng.normal(size=(512, 8)), jnp.float32)
        out = M.r_precision_suite(cond, motion, r_size=32)
        # chance level k/32; generous 3x bounds at 512 samples
        assert out["r_precision_top_1"] < 3 / 32
        assert out["r_precision_top_3"] < 9 / 32

    def test_requires_r_size_pairs(self):
        import pytest

        e = jnp.zeros((8, 4))
        with pytest.raises(ValueError):
            M.r_precision_suite(e, e, r_size=32)

    def test_mode_collapse_is_not_perfect(self):
        # ADVICE r4: with strict '<' ranking, a mode-collapsed generator
        # (all motion embeddings identical -> every row's distances equal)
        # got rank 0 everywhere and a PERFECT top-1. Half-counted ties must
        # read it as ~chance-or-worse, never as success.
        rng = np.random.default_rng(4)
        cond = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
        collapsed = jnp.tile(jnp.asarray(rng.normal(size=(1, 8)), jnp.float32),
                             (64, 1))
        out = M.r_precision_suite(cond, collapsed, r_size=32)
        # rank = 0.5*(32-1) = 15.5 for every row -> no top-k hit at all
        assert out["r_precision_top_1"] == 0.0
        assert out["r_precision_top_3"] == 0.0

    def test_cross_fit_probe_does_not_interpolate(self):
        # ADVICE r4: in the N < D regime an in-sample ridge probe
        # near-interpolates, pinning *_real at ~1.0 with no information.
        rng = np.random.default_rng(5)
        n, d_cond, d_mot = 64, 128, 16
        cond = jnp.asarray(rng.normal(size=(n, d_cond)), jnp.float32)
        motion = jnp.asarray(rng.normal(size=(n, d_mot)), jnp.float32)  # independent!
        # the pathology: in-sample fit "identifies" unrelated motion perfectly
        w = M.fit_linear_probe(cond, motion)
        in_sample = M.apply_linear_probe(w, cond)
        assert M.r_precision_suite(in_sample, motion, r_size=32)[
            "r_precision_top_1"] > 0.9
        # the fix: out-of-fold predictions read ~chance on independent data
        oof = M.cross_fit_linear_probe(cond, motion)
        out = M.r_precision_suite(oof, motion, r_size=32)
        assert out["r_precision_top_1"] < 4 / 32

    def test_cross_fit_probe_keeps_real_signal(self):
        # ...while a genuine linear audio->motion relationship survives
        # cross-fitting (N=256 > D=16 here, light noise)
        rng = np.random.default_rng(6)
        cond = jnp.asarray(rng.normal(size=(256, 16)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
        motion = cond @ a + 0.05 * jnp.asarray(
            rng.normal(size=(256, 8)), jnp.float32
        )
        oof = M.cross_fit_linear_probe(cond, motion)
        out = M.r_precision_suite(oof, motion, r_size=32)
        assert out["r_precision_top_1"] > 0.8

    def test_linear_probe_recovers_exact_map(self):
        rng = np.random.default_rng(3)
        cond = jnp.asarray(rng.normal(size=(200, 12)), jnp.float32)
        a = jnp.asarray(rng.normal(size=(12, 6)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(6,)), jnp.float32)
        motion = cond @ a + b
        w = M.fit_linear_probe(cond, motion)
        pred = M.apply_linear_probe(w, cond)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(motion), atol=2e-3)
        out = M.r_precision_suite(pred, motion, r_size=32)
        assert out["r_precision_top_1"] == 1.0
