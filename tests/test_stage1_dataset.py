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
