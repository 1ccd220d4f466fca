"""Tests for MFCC/DTW, TextGrid, facial utils, classification stats,
registry, and the raw-diffusion toolkit."""

import jax
import jax.numpy as jnp
import numpy as np


class TestMFCC:
    def test_shapes_and_dct(self):
        from amuse_tpu.audio.mfcc import _dct_matrix, mfcc

        wave = jnp.asarray(np.random.default_rng(0).normal(size=16000), jnp.float32)
        out = mfcc(wave)
        # torchaudio framing: center=True -> N // hop + 1 = 16000//128 + 1
        assert out.shape == (126, 13)
        d = _dct_matrix(13, 128)
        # orthonormal rows: D^T D = I over the kept coefficients
        np.testing.assert_allclose(d.T @ d, np.eye(13), atol=1e-5)

    def test_mel_filterbank_properties(self):
        from amuse_tpu.audio.mfcc import _mel_filterbank

        fbk = _mel_filterbank(1025, 128, 16000)
        assert fbk.shape == (1025, 128)
        assert fbk.min() >= 0.0 and fbk.max() <= 1.0
        # every triangle has support, peaks are ordered in frequency
        assert (fbk.sum(axis=0) > 0).all()
        peaks = fbk.argmax(axis=0)
        assert (np.diff(peaks) > 0).all()

    def test_db_floor_is_80_below_peak(self):
        from amuse_tpu.audio.mfcc import TOP_DB, _dct_matrix, mfcc

        # a loud tone: silence elsewhere must clamp at peak - 80 dB, so
        # reconstructed log-mel energies span at most TOP_DB
        t = np.arange(32000) / 16000.0
        wave = jnp.asarray(np.sin(2 * np.pi * 440.0 * t), jnp.float32)
        out = np.asarray(mfcc(wave, n_mfcc=128))
        d = _dct_matrix(128, 128)
        db = out @ np.linalg.inv(d)  # invert the (square) ortho DCT
        assert db.max() - db.min() <= TOP_DB + 1e-3

    def test_dtw_identity_alignment(self):
        from amuse_tpu.audio.mfcc import dtw_cost, dtw_path

        a = jnp.asarray(np.random.default_rng(1).normal(size=(20, 4)), jnp.float32)
        acc = np.asarray(dtw_cost(a, a))
        path = dtw_path(acc)
        # aligning a sequence with itself follows the diagonal
        assert path[0] == (0, 0) and path[-1] == (19, 19)
        assert all(i == j for i, j in path)
        assert acc[-1, -1] < 1e-2  # f32 matmul-based distance floor

    def test_dtw_shifted_sequences(self):
        from amuse_tpu.audio.mfcc import dtw_cost

        rng = np.random.default_rng(2)
        base = rng.normal(size=(30, 4)).astype(np.float32)
        shifted = np.concatenate([base[:1]] * 5 + [base], axis=0)  # delayed copy
        acc = np.asarray(dtw_cost(jnp.asarray(base), jnp.asarray(shifted)))
        random = rng.normal(size=(35, 4)).astype(np.float32)
        acc_rand = np.asarray(dtw_cost(jnp.asarray(base), jnp.asarray(random)))
        assert acc[-1, -1] < acc_rand[-1, -1]


class TestTextGrid:
    SAMPLE = """File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 2.5
tiers? <exists>
size = 1
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 2.5
        intervals: size = 3
        intervals [1]:
            xmin = 0.0
            xmax = 0.5
            text = ""
        intervals [2]:
            xmin = 0.5
            xmax = 1.2
            text = "hello"
        intervals [3]:
            xmin = 1.2
            xmax = 2.5
            text = "world"
"""

    def test_parse_and_query(self, tmp_path):
        from amuse_tpu.data.textgrid import parse_textgrid, word_onsets

        p = tmp_path / "a.TextGrid"
        p.write_text(self.SAMPLE)
        tiers = parse_textgrid(p)
        assert "words" in tiers
        t = tiers["words"]
        assert len(t.intervals) == 3
        assert t.at(0.7) == "hello"
        assert t.at(2.0) == "world"
        assert word_onsets(tiers) == [0.5, 1.2]


class TestFacial:
    def test_process_and_recombine(self):
        from amuse_tpu.data import facial as F

        names = list(F.LIP_SYNC_FACS + F.REMAINING_FACS)
        frames = [
            {"time": i / 60.0, "weights": list(np.full(len(names), i, np.float32))}
            for i in range(60)
        ]
        data = {"names": names, "frames": frames}
        lip, rem, full = F.process_facial(data, target_fps=30)
        assert lip.shape[1] == 19 and rem.shape[1] == 32
        assert lip.shape[0] == 30  # 60 fps decimated by 2
        combined = F.combine_streams(lip, rem, names)
        np.testing.assert_allclose(combined[0], full[0])

    def test_standardize_round_trip(self):
        from amuse_tpu.data.facial import standardize

        x = np.random.default_rng(0).normal(size=(50, 7)).astype(np.float32)
        z, m, s = standardize(x)
        np.testing.assert_allclose(z.mean(axis=0), 0, atol=1e-5)
        back, _, _ = standardize(z, m, s, forward=False)
        np.testing.assert_allclose(back, x, atol=1e-5)


class TestClassificationStats:
    def test_perfect_predictions(self):
        from amuse_tpu.eval.classification import classification_stats

        labels = jnp.asarray([0, 1, 2, 3, 0, 1])
        logits = jax.nn.one_hot(labels, 4) * 10.0
        s = classification_stats(logits, labels, 4)
        assert float(s["acc"]) == 100.0
        assert float(s["precision_macro"]) == 1.0
        assert float(s["recall_macro"]) == 1.0

    def test_known_confusion(self):
        from amuse_tpu.eval.classification import confusion_matrix

        cm = np.asarray(
            confusion_matrix(jnp.asarray([0, 0, 1]), jnp.asarray([0, 1, 1]), 2)
        )
        np.testing.assert_array_equal(cm, [[1, 0], [1, 1]])


class TestRegistry:
    def test_all_tags_resolve(self):
        from amuse_tpu.models.registry import REGISTRY, get_model

        for tag in REGISTRY:
            assert get_model(tag) is not None


class TestGaussianDiffusion:
    def test_q_sample_endpoints(self):
        from amuse_tpu.diffusion import gaussian as G

        gd = G.make_gaussian_diffusion(G.linear_betas(100))
        x0 = jnp.ones((2, 4))
        noise = jnp.full((2, 4), 2.0)
        early = G.q_sample(gd, x0, jnp.asarray([0, 0]), noise)
        late = G.q_sample(gd, x0, jnp.asarray([99, 99]), noise)
        # early: mostly signal; late: mostly noise
        assert abs(float(early[0, 0]) - 1.0) < 0.2
        assert abs(float(late[0, 0]) - 2.0) < 0.6

    def test_p_sample_recovers_point_mass(self):
        from amuse_tpu.diffusion import gaussian as G

        gd = G.make_gaussian_diffusion(G.linear_betas(50))
        target = jnp.asarray([[0.7, -0.3]])

        def model_fn(x, t):  # oracle x0-predictor
            return jnp.broadcast_to(target, x.shape)

        out = G.p_sample_loop(gd, model_fn, jax.random.key(0), (4, 2))
        np.testing.assert_allclose(np.asarray(out), np.broadcast_to(target, (4, 2)), atol=0.15)

    def test_ddim_respaced(self):
        from amuse_tpu.diffusion import gaussian as G

        gd = G.make_gaussian_diffusion(G.cosine_betas(100))
        out = G.ddim_sample_loop(
            gd, lambda x, t: jnp.zeros_like(x), jax.random.key(1), (3, 5), 10
        )
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-5)

    def test_respaced_timesteps_match_openai_uniform(self):
        """space_timesteps 'uniform' semantics (mdm_respace.py:41-58):
        frac stride (size-1)/(count-1), so T-1 is ALWAYS included - the
        first denoiser call must see the t matching the N(0,1) init."""
        from amuse_tpu.diffusion import gaussian as G

        ts = G.respaced_timesteps(1000, 50)
        assert ts[0] == 0 and ts[-1] == 999 and len(ts) == 50
        assert np.all(np.diff(ts) > 0)
        np.testing.assert_array_equal(
            G.respaced_timesteps(300, 10),
            [0, 33, 66, 100, 133, 166, 199, 233, 266, 299],
        )
        np.testing.assert_array_equal(G.respaced_timesteps(100, 1), [0])

    def test_loss_aware_resampler_prefers_lossy_timesteps(self):
        from amuse_tpu.diffusion import gaussian as G

        state = G.LossAwareState.create(10, history=4)
        # fill history: timestep 3 has 10x the loss of others
        for _ in range(8):
            t = jnp.arange(10)
            losses = jnp.where(t == 3, 10.0, 1.0)
            state = G.loss_aware_update(state, t, losses)
        p = np.asarray(G.loss_aware_weights(state))
        assert p[3] > 3 * p[0]
        t, w = G.sample_timesteps(jax.random.key(0), state, 64)
        assert t.shape == (64,) and w.shape == (64,)
        assert (np.asarray(t) == 3).sum() > 8  # oversampled


class TestRawDenoiser:
    def test_shapes(self):
        from amuse_tpu.models.raw_diffusion import RawDenoiserConfig, RawPoseDenoiser

        cfg = RawDenoiserConfig(nfeats=12, latent_dim=16, ff_size=32, num_layers=2, num_heads=2, cond_dim=8, window=6)
        model = RawPoseDenoiser(cfg)
        x = jnp.zeros((2, 6, 12))
        t = jnp.asarray([5, 50])
        con = jnp.zeros((2, 8))
        params = model.init(jax.random.key(0), x, t, con)["params"]
        out = model.apply({"params": params}, x, t, con)
        assert out.shape == (2, 6, 12)
