"""Round-3 data-layer review regressions: in-place merge_caches data loss,
truncated-ABIN acceptance, ignored mocap_frame_rate, batch-coupled MFCC
top_db clamp, empty facial captures."""

import json
from pathlib import Path

import numpy as np
import pytest

from amuse_tpu.data import cache as cache_mod


def _mini_cache(tmp_path, name, n, seed):
    """Write a tiny valid cache of n windows with recognisable actor ids."""
    rng = np.random.default_rng(seed)
    d = tmp_path / name
    d.mkdir()
    shard = d / "shard_00000"
    shard.mkdir()
    cols = {
        "motion": rng.normal(size=(n, 12, 168)).astype(np.float32),
        "actor_id": np.arange(n, dtype=np.int32) + seed * 100,
        "emo_label": np.zeros(n, np.int32),
        "audio": rng.normal(size=(n, 100)).astype(np.float32),
        "con": rng.normal(size=(n, 8)).astype(np.float32),
        "emo": rng.normal(size=(n, 8)).astype(np.float32),
        "sty": rng.normal(size=(n, 8)).astype(np.float32),
    }
    for f, a in cols.items():
        np.save(shard / f"{f}.npy", a)
    (d / "manifest.json").write_text(json.dumps(
        {"num_windows": n, "shards": ["shard_00000"],
         "fields": list(cache_mod.FIELDS), "ast_source": "w"}))
    return d, cols


class TestMergeCaches:
    def test_merge_into_fresh_dir(self, tmp_path):
        a, ca = _mini_cache(tmp_path, "a", 3, 1)
        b, cb = _mini_cache(tmp_path, "b", 2, 2)
        out = cache_mod.merge_caches([a, b], tmp_path / "out")
        wc = cache_mod.WindowCache(out)
        assert len(wc) == 5
        got = sorted(int(wc[i]["actor_id"]) for i in range(5))
        assert got == [100, 101, 102, 200, 201]

    def test_merge_in_place_when_out_dir_is_a_source(self, tmp_path):
        # the round-3 review repro: merging INTO source b used to overwrite
        # b's shard with a's data before b's entries were read (data loss)
        a, _ = _mini_cache(tmp_path, "a", 3, 1)
        b, _ = _mini_cache(tmp_path, "b", 2, 2)
        out = cache_mod.merge_caches([a, b], b)
        wc = cache_mod.WindowCache(out)
        assert len(wc) == 5
        got = sorted(int(wc[i]["actor_id"]) for i in range(5))
        assert got == [100, 101, 102, 200, 201]  # b's windows survive

    def test_incompatible_sources_refused_before_any_copy(self, tmp_path):
        a, _ = _mini_cache(tmp_path, "a", 3, 1)
        b, _ = _mini_cache(tmp_path, "b", 2, 2)
        mb = json.loads((b / "manifest.json").read_text())
        mb["ast_source"] = "OTHER"
        (b / "manifest.json").write_text(json.dumps(mb))
        out = tmp_path / "out"
        with pytest.raises(RuntimeError, match="DIFFERENT AST weights"):
            cache_mod.merge_caches([a, b], out)
        # validation happens before any shard copy: out_dir has no shards
        assert not any(out.glob("shard_*")), list(out.iterdir())


class TestAbinTruncation:
    def test_truncated_abin_is_rejected(self, tmp_path):
        from amuse_tpu.native import loader as nl

        if nl.build() is None:
            pytest.skip("no g++ toolchain")
        rng = np.random.default_rng(0)
        rec = {
            "motion": rng.normal(size=(8, 12, 168)).astype(np.float32),
            "actor_id": np.arange(8, dtype=np.int32),
        }
        p = nl.write_abin(tmp_path / "train.abin", rec)
        good = nl.NativeWindowLoader(p)
        assert good.num_records == 8
        del good
        data = p.read_bytes()
        (tmp_path / "trunc.abin").write_bytes(data[: len(data) // 2])
        with pytest.raises(Exception, match="abin|open|ABIN|truncat|invalid"):
            nl.NativeWindowLoader(tmp_path / "trunc.abin")

    def test_interrupted_write_leaves_no_abin(self, tmp_path, monkeypatch):
        from amuse_tpu.native import loader as nl

        # simulate a crash mid-write: the temp file may remain, but the
        # final path must not exist (mtime-gated reuse would accept it)
        calls = {"n": 0}
        real_fsync = nl.os.fsync

        def boom(fd):
            raise KeyboardInterrupt

        monkeypatch.setattr(nl.os, "fsync", boom)
        rec = {"actor_id": np.arange(4, dtype=np.int32)}
        with pytest.raises(KeyboardInterrupt):
            nl.write_abin(tmp_path / "train.abin", rec)
        assert not (tmp_path / "train.abin").exists()
        monkeypatch.setattr(nl.os, "fsync", real_fsync)


class TestMocapFrameRate:
    def _npz(self, tmp_path, rate):
        t = 120
        np.savez(tmp_path / "m.npz",
                 poses=np.arange(t * 165, dtype=np.float32).reshape(t, 165),
                 trans=np.zeros((t, 3), np.float32),
                 mocap_frame_rate=np.asarray(rate))
        return tmp_path / "m.npz"

    def test_120fps_downsamples_to_30(self, tmp_path):
        from amuse_tpu.data.beat import load_mosh_motion

        m = load_mosh_motion(self._npz(tmp_path, 120.0))
        assert m.shape == (30, 168)
        # every 4th frame of the original
        np.testing.assert_array_equal(m[1, :165],
                                      np.arange(4 * 165, 5 * 165, dtype=np.float32))

    def test_30fps_passthrough(self, tmp_path):
        from amuse_tpu.data.beat import load_mosh_motion

        assert load_mosh_motion(self._npz(tmp_path, 30.0)).shape == (120, 168)

    def test_non_integer_ratio_raises(self, tmp_path):
        from amuse_tpu.data.beat import load_mosh_motion

        with pytest.raises(ValueError, match="mocap_frame_rate"):
            load_mosh_motion(self._npz(tmp_path, 25.0))


class TestMfccBatchClamp:
    def test_quiet_item_unaffected_by_loud_neighbor(self):
        import jax.numpy as jnp

        from amuse_tpu.audio.mfcc import mfcc

        rng = np.random.default_rng(0)
        quiet = (1e-4 * rng.normal(size=16000)).astype(np.float32)
        loud = (10.0 * rng.normal(size=16000)).astype(np.float32)
        alone = np.asarray(mfcc(jnp.asarray(quiet)))
        batched = np.asarray(mfcc(jnp.asarray(np.stack([quiet, loud]))))[0]
        np.testing.assert_allclose(batched, alone, atol=1e-4)


class TestFacialEmpty:
    def test_zero_frames_returns_empty_arrays(self):
        from amuse_tpu.data.facial import LIP_SYNC_FACS, REMAINING_FACS, process_facial

        names = list(LIP_SYNC_FACS) + list(REMAINING_FACS)
        lip, rem, full = process_facial({"names": names, "frames": []})
        assert lip.shape == (0, len(LIP_SYNC_FACS))
        assert rem.shape == (0, len(REMAINING_FACS))
        assert full.shape == (0, len(names))
