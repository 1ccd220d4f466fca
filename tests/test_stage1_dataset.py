"""Stage-1 quad dataset: index-deduplicated bank layout (dm/dm.py:453-498)."""

import numpy as np

from amuse_tpu.data import stage1
from amuse_tpu.data.actors import PRETRAINED_TAKES


def make_per_take(actors=(1, 2, 3), emotions=("neutral", "happy"), chunks=2, t=8, f=4):
    rng = np.random.default_rng(0)
    per_take = {}
    for a in actors:
        for emo_idx, emo in enumerate(emotions):
            for take in PRETRAINED_TAKES[emo]:
                per_take[(a, take)] = {
                    "fbanks": rng.normal(size=(chunks, t, f)).astype(np.float32),
                    "emo": emo_idx,
                }
    return per_take


class TestBuildQuads:
    def test_bank_is_deduplicated(self):
        per_take = make_per_take()
        out = stage1.build_quads(per_take, "train")
        # every (actor, take, chunk) stored exactly once regardless of how
        # many quads reference it
        n_unique = sum(v["fbanks"].shape[0] for v in per_take.values())
        assert out["fbank_bank"].shape[0] <= n_unique
        # 3 actors -> 3 pairs x 2 emotions x 1 take-combination x 2 chunks
        assert out["quad_idx"].shape == (12, 4)
        assert out["quad_idx"].max() < out["fbank_bank"].shape[0]

    def test_quads_reconstruct_member_fbanks(self):
        per_take = make_per_take(actors=(1, 2), emotions=("neutral",))
        out = stage1.build_quads(per_take, "train")
        t1, t2 = PRETRAINED_TAKES["neutral"]
        # first quad, chunk 0: [a1t1, a1t2, a2t1, a2t2]
        got = out["fbank_bank"][out["quad_idx"][0]]
        want = np.stack(
            [
                per_take[(1, t1)]["fbanks"][0], per_take[(1, t2)]["fbanks"][0],
                per_take[(2, t1)]["fbanks"][0], per_take[(2, t2)]["fbanks"][0],
            ]
        )
        np.testing.assert_array_equal(got, want)

    def test_mismatched_emotion_labels_skip_quad(self):
        per_take = make_per_take(actors=(1, 2), emotions=("neutral",))
        t1, _ = PRETRAINED_TAKES["neutral"]
        per_take[(2, t1)]["emo"] = 5  # reference asserts equality (dm/dm.py:473-485)
        out = stage1.build_quads(per_take, "train")
        assert out["quad_idx"].shape[0] == 0

    def test_empty_split(self):
        out = stage1.build_quads({}, "val")
        assert out["quad_idx"].shape == (0, 4)
        assert out["fbank_bank"].shape[0] == 0


class TestBatches:
    def test_gathers_from_bank(self):
        per_take = make_per_take()
        data = stage1.build_quads(per_take, "train")
        got = list(stage1.batches(data, 4))
        assert all(b["fbanks"].shape == (4, 4, 8, 4) for b in got)
        first = got[0]
        np.testing.assert_array_equal(
            first["fbanks"], data["fbank_bank"][data["quad_idx"][:4]]
        )

    def test_legacy_materialised_layout_still_works(self):
        rng = np.random.default_rng(1)
        legacy = {
            "fbanks": rng.normal(size=(6, 4, 8, 4)).astype(np.float32),
            "emo_id": np.zeros(6, np.int32),
            "a1_id": np.zeros(6, np.int32),
            "a2_id": np.ones(6, np.int32),
        }
        got = list(stage1.batches(legacy, 3))
        assert len(got) == 2
        np.testing.assert_array_equal(got[0]["fbanks"], legacy["fbanks"][:3])

    def test_roundtrip_through_npz(self, tmp_path):
        per_take = make_per_take()
        train = stage1.build_quads(per_take, "train")
        val = stage1.build_quads(per_take, "val")
        stage1.save_dataset(tmp_path / "s1.npz", train, val)
        train2, val2 = stage1.load_dataset(tmp_path / "s1.npz")
        np.testing.assert_array_equal(train2["fbank_bank"], train["fbank_bank"])
        np.testing.assert_array_equal(train2["quad_idx"], train["quad_idx"])
        assert val2["quad_idx"].shape == (0, 4)


class TestProvenance:
    """Skip-if-built semantics of the stage-1 dataset (ADVICE round 3)."""

    def _save(self, path, provenance):
        per_take = make_per_take()
        stage1.save_dataset(
            path,
            stage1.build_quads(per_take, "train"),
            stage1.build_quads(per_take, "val"),
            provenance,
        )

    def test_matching_provenance_is_current(self, tmp_path):
        p = tmp_path / "s1.npz"
        self._save(p, ["1/0_9_9", "2/0_9_9"])
        assert stage1.dataset_is_current(p, ["1/0_9_9", "2/0_9_9"])

    def test_changed_take_set_forces_rebuild(self, tmp_path):
        p = tmp_path / "s1.npz"
        self._save(p, ["1/0_9_9", "2/0_9_9"])
        assert not stage1.dataset_is_current(p, ["1/0_9_9"])  # removed take
        assert not stage1.dataset_is_current(
            p, ["1/0_9_9", "2/0_9_9", "3/0_9_9"]
        )  # added take

    def test_legacy_npz_without_meta_rebuilds(self, tmp_path):
        p = tmp_path / "legacy.npz"
        np.savez_compressed(p, train_emo_id=np.zeros(2, np.int32))
        assert not stage1.dataset_is_current(p, [])

    def test_provenance_none_never_current(self, tmp_path):
        # provenance=None means "unknown origin" and must not be mistaken
        # for a genuinely-empty take set
        p = tmp_path / "s1.npz"
        self._save(p, None)
        assert not stage1.dataset_is_current(p, [])
        # ... while an empty LIST is a real (empty) take set
        p2 = tmp_path / "s2.npz"
        self._save(p2, [])
        assert stage1.dataset_is_current(p2, [])

    def test_missing_file(self, tmp_path):
        assert not stage1.dataset_is_current(tmp_path / "nope.npz", [])

    def test_load_ignores_meta_key(self, tmp_path):
        p = tmp_path / "s1.npz"
        self._save(p, ["1/0_9_9"])
        train, val = stage1.load_dataset(p)
        assert not any(k.startswith("__") for k in list(train) + list(val))

    def test_suffixless_path_normalises_everywhere(self, tmp_path):
        # np.savez_compressed appends .npz to suffix-less names; save /
        # skip-check / load must all agree on the on-disk file
        p = tmp_path / "stage1"
        self._save(p, ["1/0_9_9"])
        assert (tmp_path / "stage1.npz").exists()
        assert stage1.dataset_is_current(p, ["1/0_9_9"])
        train, _ = stage1.load_dataset(p)
        assert "fbank_bank" in train


class TestShardedFbank:
    def test_sharded_matches_single_device_bytes(self):
        """prepare_data's mesh-sharded fbank pass == the default closure.

        5 chunks over an 8-device mesh exercises the pad-and-strip path;
        equality must be exact (the dataset bytes may not depend on the
        mesh size)."""
        import jax
        import jax.numpy as jnp

        from amuse_tpu.audio import fbank as fb
        from amuse_tpu.parallel import make_mesh

        rng = np.random.default_rng(0)
        chunks = rng.normal(scale=0.05, size=(5, fb.CHUNK_SAMPLES)).astype(np.float32)
        want = np.asarray(fb.wav_chunk_to_fbank(jnp.asarray(chunks)))
        got = fb.make_sharded_fbank(make_mesh())(chunks)
        np.testing.assert_array_equal(got, want)
        assert got.shape == (5, 1024, 128)

    def test_fbanks_per_take_uses_injected_fn(self, tmp_path):
        """The fbank_fn hook is the sharding seam: verify it is what runs."""
        from amuse_tpu.audio import fbank as fb
        from amuse_tpu.audio.wavio import save_wav
        from amuse_tpu.data import beat as beat_mod

        wav = tmp_path / "1_x_0_9_9.wav"
        rng = np.random.default_rng(1)
        save_wav(wav, rng.normal(scale=0.05, size=fb.CHUNK_SAMPLES).astype(np.float32))
        take = beat_mod.Take(
            actor_id=1, actor_name="x", take="0_9_9", wav=wav,
            bvh=None, emotion_csv=None, mosh_npz=None,
        )
        calls = []

        def fn(chunks):
            calls.append(chunks.shape)
            return np.zeros((chunks.shape[0], 4, 2), np.float32)

        out = stage1.fbanks_per_take([take], fbank_fn=fn)
        assert calls == [(1, fb.CHUNK_SAMPLES)]
        assert out[(1, "0_9_9")]["fbanks"].shape == (1, 4, 2)
