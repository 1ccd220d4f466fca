"""Tests for the config system, actor tables, cache, and checkpointing."""

import numpy as np
import pytest

from amuse_tpu.cli.config import Config, dump_config, load_config, parse_cli_overrides
from amuse_tpu.data import actors


class TestConfig:
    def test_defaults_match_reference_knobs(self):
        cfg = Config()
        assert cfg.gesture.batch_size == 32
        assert cfg.gesture.learning_rate == 1e-4
        assert cfg.gesture.epochs == 12_000
        assert cfg.gesture.num_inference_steps == 50
        assert cfg.audio.learning_rate == 1e-5
        assert cfg.audio.epochs == 25
        assert cfg.audio.dataset_mean == pytest.approx(-9.173025)

    def test_overrides_pure(self):
        base = Config()
        cfg = load_config(None, {"gesture": {"epochs": 7}, "debug": True})
        assert cfg.gesture.epochs == 7 and cfg.debug is True
        assert base.gesture.epochs == 12_000  # original untouched

    def test_parse_cli_overrides(self):
        o = parse_cli_overrides(["gesture.epochs=5", "debug=true", "out_dir=x"])
        assert o == {"gesture": {"epochs": 5}, "debug": True, "out_dir": "x"}

    def test_dump_round_trips(self, tmp_path):
        p = tmp_path / "cfg.json"
        p.write_text(dump_config(load_config(None, {"seed": 7})))
        assert load_config(str(p)).seed == 7


class TestActors:
    def test_roster_size_and_balance(self):
        assert len(actors.ACTORS) == 30
        males = sum(1 for a in actors.ACTORS.values() if a.gender == "male")
        assert males == 15

    def test_stage2_subset(self):
        assert len(actors.STAGE2_ACTOR_IDS) == 25
        assert 11 not in actors.STAGE2_ACTOR_IDS

    def test_subject_gender(self):
        g, b = actors.subject_to_gender_beta("miranda")
        assert g == "female" and b.shape == (300,)
        g2, _ = actors.subject_to_gender_beta("scott")
        assert g2 == "male"

    def test_vendored_betas_nonzero_out_of_the_box(self):
        # 26 actors ship real MoSh betas (ldm_evals.py:457-2300); spot-check
        # a few leading coefficients against the reference table.
        _, b = actors.subject_to_gender_beta("scott")
        assert np.abs(b).sum() > 1.0
        _, t = actors.subject_to_gender_beta("tiffnay")
        np.testing.assert_allclose(
            t[:3], [-1.12456942, 0.24825145, 0.24261136], atol=1e-7
        )
        shipped = [
            a.name
            for a in actors.ACTORS.values()
            if a.name not in ("zhang", "jaime", "kexin", "hanieh")
        ]
        for name in shipped:
            _, b = actors.subject_to_gender_beta(name)
            assert np.abs(b).sum() > 0, name

    def test_missing_actor_betas_warn_and_zero(self):
        import warnings

        actors._WARNED_MISSING.discard("zhang")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _, b = actors.subject_to_gender_beta("zhang")
        assert np.abs(b).sum() == 0
        assert any("zhang" in str(x.message) for x in w)

    def test_npz_export_embeds_real_betas(self, tmp_path):
        from amuse_tpu.viz.export import write_smplx_npz

        p = write_smplx_npz(
            tmp_path / "x.npz",
            np.zeros((4, 55, 3)),
            np.zeros((4, 3)),
            subject="scott",
        )
        d = np.load(p)
        assert np.abs(d["betas"]).sum() > 1.0
        assert str(d["gender"]) == "male"

    def test_pretrained_takes_cover_8_emotions(self):
        assert len(actors.PRETRAINED_TAKES) == 8
        assert len(actors.PRETRAINED_TAKE_NUMBERS) == 16
        assert actors.emotion_id("neutral") == 0
        assert actors.emotion_id("disgust") == 7


class TestWindowCache:
    def test_build_and_read(self, tmp_path):
        from amuse_tpu.data import cache as C
        from amuse_tpu.data.beat import Take

        # synthesise two fake takes on disk
        from amuse_tpu.audio.wavio import save_wav

        root = tmp_path / "beat"
        takes = []
        rng = np.random.default_rng(0)
        for actor_id, name in [(2, "scott"), (9, "miranda")]:
            d = root / str(actor_id)
            d.mkdir(parents=True)
            stem = f"{actor_id}_{name}_0_9_9"
            wav = d / f"{stem}.wav"
            save_wav(wav, rng.normal(scale=0.05, size=330000).astype(np.float32))
            npz = d / f"{stem}_mosh.npz"
            np.savez(
                npz,
                poses=rng.normal(scale=0.2, size=(650, 165)).astype(np.float32),
                trans=rng.normal(scale=0.1, size=(650, 3)).astype(np.float32),
            )
            csv = d / f"{stem}.csv"
            csv.write_text("0,0\n1,0\n")
            takes.append(
                Take(actor_id, name, "0_9_9", wav, None, csv, npz)
            )

        def fake_encode(chunks):
            n = chunks.shape[0]
            return {
                "con": np.ones((n, 8), np.float32),
                "emo": np.full((n, 8), 2.0, np.float32),
                "sty": np.full((n, 8), 3.0, np.float32),
            }

        out = C.build_stage2_cache(takes, tmp_path / "cache", fake_encode, progress=False)
        wc = C.WindowCache(out)
        assert len(wc) == 4  # 2 takes x min(650//300, 2 chunks) = 2 windows each
        item = wc[0]
        assert item["motion"].shape == (300, 168)
        assert item["con"].shape == (8,)
        batches = list(wc.batches(2, np.random.default_rng(1)))
        assert len(batches) == 2
        assert batches[0]["motion"].shape == (2, 300, 168)
        assert batches[0]["emo_label"].shape == (2,)
        # restartability: second build call is a TRUE no-op - same window
        # count, encoder NOT re-invoked
        calls_before = fake_encode.calls if hasattr(fake_encode, "calls") else None
        C.build_stage2_cache(takes, tmp_path / "cache", fake_encode, progress=False)
        wc2 = C.WindowCache(tmp_path / "cache")
        assert len(wc2) == 4
        if calls_before is not None:
            assert fake_encode.calls == calls_before, "cache was re-encoded" 

    def test_betas_for_actor_ids(self):
        from amuse_tpu.data.cache import betas_for_actor_ids

        b = betas_for_actor_ids(np.asarray([1, 8]))  # scott, miranda (0-based)
        assert b.shape == (2, 300)


class TestCheckpointManager:
    def test_save_restore_best(self, tmp_path):
        import jax.numpy as jnp

        from amuse_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(tmp_path / "ckpt")
        tree = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
        mgr.save(1, tree, {"total": 5.0})
        mgr.save(2, tree, {"total": 3.0})
        mgr.save(3, tree, {"total": 4.0})
        assert mgr.steps() == [1, 2, 3]
        assert mgr.best_step("total", "min") == 2
        restored, meta = mgr.restore(2)
        np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones((3, 3)))
        assert meta["metrics"]["total"] == 3.0


class TestCacheProvenance:
    def test_mismatched_ast_source_raises(self, tmp_path):
        import json

        import pytest

        from amuse_tpu.data.cache import build_stage2_cache

        (tmp_path / "manifest.json").write_text(
            json.dumps({"num_windows": 1, "shards": [], "fields": [],
                        "ast_source": "random-weights"})
        )
        with pytest.raises(RuntimeError, match="built with AST weights"):
            build_stage2_cache([], tmp_path, None, ast_source="/ckpt/run1")

    def test_same_or_unknown_source_skips_quietly(self, tmp_path):
        import json

        from amuse_tpu.data.cache import build_stage2_cache

        (tmp_path / "manifest.json").write_text(
            json.dumps({"num_windows": 1, "shards": [], "fields": []})
        )  # legacy manifest without ast_source: trusted (no key to compare)
        assert build_stage2_cache([], tmp_path, None, ast_source="x") == tmp_path
