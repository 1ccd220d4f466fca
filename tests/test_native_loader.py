"""Tests for the C++ ABIN cache loader (skipped if no toolchain)."""

import numpy as np
import pytest

from amuse_tpu import native


@pytest.fixture(scope="module")
def abin_file(tmp_path_factory):
    if not native.is_available():
        pytest.skip("g++ unavailable")
    rng = np.random.default_rng(0)
    records = {
        "motion": rng.normal(size=(20, 6, 8)).astype(np.float32),
        "label": np.arange(20, dtype=np.int32),
        "feat": rng.normal(size=(20, 4)).astype(np.float32),
    }
    path = tmp_path_factory.mktemp("abin") / "cache.abin"
    native.write_abin(path, records)
    return path, records


class TestNativeLoader:
    def test_metadata(self, abin_file):
        path, records = abin_file
        ld = native.NativeWindowLoader(path)
        assert len(ld) == 20
        names = [f[0] for f in ld.fields]
        assert names == ["motion", "label", "feat"]
        assert ld.fields[0][2] == (6, 8)
        assert ld.fields[1][1] == np.int32
        ld.close()

    def test_unshuffled_epoch_round_trips(self, abin_file):
        path, records = abin_file
        ld = native.NativeWindowLoader(path)
        batches = list(ld.epoch(4, shuffle=False))
        assert len(batches) == 5
        got_motion = np.concatenate([b["motion"] for b in batches])
        np.testing.assert_array_equal(got_motion, records["motion"])
        got_labels = np.concatenate([b["label"] for b in batches])
        np.testing.assert_array_equal(got_labels, records["label"])
        ld.close()

    def test_shuffled_epoch_is_permutation(self, abin_file):
        path, records = abin_file
        ld = native.NativeWindowLoader(path)
        labels = np.concatenate([b["label"] for b in ld.epoch(4, seed=7)])
        assert sorted(labels.tolist()) == list(range(20))
        labels2 = np.concatenate([b["label"] for b in ld.epoch(4, seed=7)])
        np.testing.assert_array_equal(labels, labels2)  # seeded determinism
        labels3 = np.concatenate([b["label"] for b in ld.epoch(4, seed=8)])
        assert not np.array_equal(labels, labels3)
        ld.close()

    def test_drop_remainder(self, abin_file):
        path, _ = abin_file
        ld = native.NativeWindowLoader(path)
        assert len(list(ld.epoch(6, shuffle=False))) == 3  # 20 // 6
        ld.close()

    def test_rows_stay_aligned_under_shuffle(self, abin_file):
        path, records = abin_file
        ld = native.NativeWindowLoader(path)
        for b in ld.epoch(5, seed=3):
            for i, lbl in enumerate(b["label"]):
                np.testing.assert_array_equal(b["motion"][i], records["motion"][lbl])
                np.testing.assert_array_equal(b["feat"][i], records["feat"][lbl])
        ld.close()


def test_cache_to_abin_conversion(tmp_path):
    if not native.is_available():
        pytest.skip("g++ unavailable")
    from amuse_tpu.data.cache import FIELDS

    # synthesize a tiny npz shard cache
    import json

    rng = np.random.default_rng(1)
    shard = {
        "motion": rng.normal(size=(3, 10, 168)).astype(np.float32),
        "actor_id": np.asarray([0, 1, 2]),
        "emo_label": np.asarray([1, 1, 2]),
        "audio": rng.normal(size=(3, 100)).astype(np.float32),
        "con": rng.normal(size=(3, 8)).astype(np.float32),
        "emo": rng.normal(size=(3, 8)).astype(np.float32),
        "sty": rng.normal(size=(3, 8)).astype(np.float32),
    }
    cache_dir = tmp_path / "cache"
    cache_dir.mkdir()
    np.savez(cache_dir / "shard_00000.npz", **shard)
    (cache_dir / "manifest.json").write_text(
        json.dumps({"num_windows": 3, "shards": ["shard_00000.npz"], "fields": list(FIELDS)})
    )
    out = native.loader.cache_to_abin(cache_dir, tmp_path / "cache.abin")
    ld = native.NativeWindowLoader(out)
    assert len(ld) == 3
    b = next(iter(ld.epoch(3, shuffle=False)))
    np.testing.assert_allclose(b["motion"], shard["motion"])
    np.testing.assert_array_equal(b["actor_id"], shard["actor_id"])
    ld.close()
