"""Training-cache build + loaders (the reference's ``prepare_data`` layer).

Re-design of dm.latent_diffusion_dm_v2 (dm/dm.py:522-692): the reference
loops take-by-take on one GPU, running the frozen AST per 10 s chunk, then
serialises pyarrow 7-tuples into LMDB. Here:

  * the AST feature pass is batched across ALL chunks of all takes and
    sharded over the mesh "data" axis - BEAT-scale cache regeneration is
    embarrassingly data-parallel (BASELINE.json's ICI target),
  * the cache is sharded directories of per-field .npy (columnar) - no
    LMDB/pyarrow native deps, memory-mapped reads; shards FLUSH to disk as
    they fill (RAM stays bounded at BEAT scale) and a finished cache is
    skip-if-built via its manifest (the reference's restartable-
    preprocessing discipline, SURVEY §5; an interrupted build restarts and
    overwrites its partial shards - the manifest is written last),
  * window slicing (300 frames <-> one 10 s audio chunk) happens at build
    time exactly like the reference (dm/dm.py:617-661).

Cache record fields (the 7-tuple, dm/dm.py:663-683):
  motion (300, 168) f32 | actor_id i32 | emo_label i32 | audio (160000,) f32
  con/emo/sty (256,) f32
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Iterator, Optional, Sequence

import numpy as np

from amuse_tpu.data import beat as beat_mod
from amuse_tpu.data.actors import ACTORS

SHARD_WINDOWS = 256  # windows per npz shard

FIELDS = ("motion", "actor_id", "emo_label", "audio", "con", "emo", "sty")


def build_stage2_cache(
    takes: Sequence[beat_mod.Take],
    out_dir: Path,
    encode_audio_fn,  # (N, 160000) f32 -> {"con","emo","sty"} (N, 256)
    window_frames: int = 300,
    chunk_samples: int = 160_000,
    reference_quirk_chunking: bool = False,
    progress: bool = True,
    ast_source: str = "",
) -> Path:
    """Build the stage-2 window cache from MoSh takes + frozen AST features.

    ``encode_audio_fn`` is typically GesturePipeline.encode_audio with
    imported stage-1 weights - jitted, batched, and (on a mesh) sharded.
    """
    from amuse_tpu.audio import fbank as fbank_mod
    from amuse_tpu.audio.wavio import load_wav_resampled

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest_path = out_dir / "manifest.json"
    if manifest_path.exists():
        # restartable (dm/dm.py:94-97) - but the cached con/emo/sty features
        # are a function of the AST weights: a cache built from DIFFERENT
        # weights (e.g. random, before the checkpoint was configured) must
        # not be silently reused, or the denoiser trains on garbage
        # conditioning forever
        stored = json.loads(manifest_path.read_text()).get("ast_source")
        if stored is not None and ast_source and stored != ast_source:
            raise RuntimeError(
                f"stage-2 cache at {out_dir} was built with AST weights "
                f"'{stored}' but the current run uses '{ast_source}'; "
                f"delete {out_dir} to rebuild with the right features"
            )
        return out_dir

    records = {f: [] for f in FIELDS}
    shards: list[str] = []
    n = 0  # windows written + buffered

    def flush(final: bool) -> None:
        """Write full SHARD_WINDOWS groups (all of the buffer when final),
        bounding RAM: one window is ~850 KB (motion+raw audio+features), so
        buffering a whole BEAT build before writing costs many GB."""
        nonlocal records
        while records["motion"] and (
            final or len(records["motion"]) >= SHARD_WINDOWS
        ):
            shard_dir = out_dir / f"shard_{len(shards):05d}"
            shard_dir.mkdir(exist_ok=True)
            for f in FIELDS:
                np.save(
                    shard_dir / f"{f}.npy",
                    np.stack(records[f][:SHARD_WINDOWS]),
                )
            shards.append(shard_dir.name)
            records = {f: records[f][SHARD_WINDOWS:] for f in FIELDS}

    for t in takes:
        motion = beat_mod.load_mosh_motion(t.mosh_npz)
        wave = load_wav_resampled(t.wav)
        if wave.shape[-1] < chunk_samples:
            # one truncated/corrupt wav must not abort the whole build
            print(f"[cache] {t.actor_name}/{t.take}: wav shorter than one "
                  f"10 s chunk ({wave.shape[-1]} samples); skipped")
            continue
        chunks = fbank_mod.window_waveform(wave, reference_quirk_chunking)
        cond = encode_audio_fn(chunks.astype(np.float32))
        con = np.asarray(cond["con"])
        emo = np.asarray(cond["emo"])
        sty = np.asarray(cond["sty"])
        emo_label = (
            beat_mod.emotion_label(t.emotion_csv) if t.emotion_csv else 0
        )
        n_windows = min(motion.shape[0] // window_frames, con.shape[0])
        for w in range(n_windows):
            records["motion"].append(
                motion[w * window_frames : (w + 1) * window_frames]
            )
            records["actor_id"].append(t.actor_id - 1)  # 0-based labels
            records["emo_label"].append(emo_label)
            records["audio"].append(chunks[w])
            records["con"].append(con[w])
            records["emo"].append(emo[w])
            records["sty"].append(sty[w])
        n += n_windows
        flush(final=False)
        if progress:
            print(f"[cache] {t.actor_name}/{t.take}: {n_windows} windows")

    if n == 0:
        # never write a 0-window manifest: the skip-if-built check would
        # then permanently short-circuit rebuilds after the data is fixed
        print(f"[cache] no windows produced from {len(takes)} takes; "
              "manifest NOT written (fix data and re-run)")
        return out_dir
    flush(final=True)
    manifest_path.write_text(
        json.dumps(
            {"num_windows": n, "shards": shards, "fields": list(FIELDS),
             "ast_source": ast_source},
            indent=1,
        )
    )
    if progress:
        print(f"[cache] wrote {n} windows in {len(shards)} shards -> {out_dir}")
    return out_dir


class WindowCache:
    """Memory-mapped read side of the stage-2 cache (the reference's
    ``dataload`` Dataset, dm/dataload.py:250-271).

    Shards are directories of per-field .npy opened with mmap_mode="r";
    legacy compressed-npz shards from older caches still load (decompressed
    in memory, not mapped)."""

    def __init__(self, cache_dir):
        self.dir = Path(cache_dir)
        manifest = json.loads((self.dir / "manifest.json").read_text())
        self.num_windows = manifest["num_windows"]
        self._shards = [self._open(s) for s in manifest["shards"]]
        self._lens = [s["actor_id"].shape[0] for s in self._shards]
        self._starts = np.cumsum([0] + self._lens)

    def _open(self, name: str):
        p = self.dir / name
        if p.is_dir():
            return {f: np.load(p / f"{f}.npy", mmap_mode="r") for f in FIELDS}
        return np.load(p)  # legacy .npz shard

    def __len__(self):
        return self.num_windows

    def __getitem__(self, idx: int) -> dict[str, np.ndarray]:
        s = int(np.searchsorted(self._starts, idx, "right") - 1)
        o = idx - self._starts[s]
        return {f: self._shards[s][f][o] for f in FIELDS}

    def batches(
        self,
        batch_size: int,
        rng: Optional[np.random.Generator] = None,
        drop_remainder: bool = True,
        include_audio: bool = False,
    ) -> Iterator[dict[str, np.ndarray]]:
        """Shuffled epoch of stacked batches ready for device_put.

        Yields {"motion", "con", "emo", "sty", "emo_label", "actor_id"
        [, "audio"]}; the train step adds betas via the actor table.
        """
        order = np.arange(len(self))
        if rng is not None:
            rng.shuffle(order)
        fields = [f for f in FIELDS if include_audio or f != "audio"]
        for i in range(0, len(order) - (batch_size - 1 if drop_remainder else 0), batch_size):
            idx = order[i : i + batch_size]
            if drop_remainder and len(idx) < batch_size:
                break
            items = [self[int(j)] for j in idx]
            yield {f: np.stack([it[f] for it in items]) for f in fields}


def merge_caches(cache_dirs, out_dir) -> Path:
    """Merge several window caches into one (the reference's move_lmdbs
    local-vs-cluster cache reconciliation, scripts/utils/misc.py:51-91):
    multi-host cache builds produce per-host directories; this re-manifests
    their shards under one root without copying array data when possible."""
    import shutil

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    # read all (tiny) manifests FIRST: compatibility is validated before any
    # shard data moves (a failed merge used to leave out_dir half-populated
    # with no manifest), and an out_dir that is itself one of the sources is
    # handled by staging its copies under temp names (the old in-place path
    # overwrote the destination's same-named shards with an earlier source's
    # data BEFORE the destination's own entries were read - data loss).
    manifests = []
    sources = set()
    for d in cache_dirs:
        d = Path(d)
        manifest = json.loads((d / "manifest.json").read_text())
        sources.add(manifest.get("ast_source", ""))
        manifests.append((d, manifest))
    if len(sources) > 1:
        raise RuntimeError(
            f"refusing to merge caches built from DIFFERENT AST weights: "
            f"{sorted(sources)} - their con/emo/sty features are incompatible"
        )
    shards, total = [], 0
    staged = []  # (temp name, final name)
    for d, manifest in manifests:
        for s in manifest["shards"]:
            src = d / s
            suffix = "" if src.is_dir() else ".npz"
            name = f"shard_{len(shards):05d}{suffix}"
            if src.resolve() == (out_dir / name).resolve():
                pass  # already in place under its final name
            else:
                tmp = f".merge_{len(shards):05d}{suffix}"
                if src.is_dir():
                    shutil.copytree(src, out_dir / tmp, dirs_exist_ok=True)
                else:
                    shutil.copyfile(src, out_dir / tmp)
                staged.append((tmp, name))
            shards.append(name)
        total += manifest["num_windows"]
    for tmp, name in staged:
        dst = out_dir / name
        if dst.exists():  # displaced destination shard already staged above
            shutil.rmtree(dst) if dst.is_dir() else dst.unlink()
        (out_dir / tmp).rename(dst)
    (out_dir / "manifest.json").write_text(
        json.dumps(
            {"num_windows": total, "shards": shards, "fields": list(FIELDS),
             # propagate provenance so the stale-weights rebuild guard in
             # build_stage2_cache keeps working on merged caches
             "ast_source": next(iter(sources), "")},
            indent=1,
        )
    )
    return out_dir


def betas_for_actor_ids(actor_ids: np.ndarray) -> np.ndarray:
    """(B,) 0-based actor ids -> (B, 300) betas via the actor table."""
    from amuse_tpu.data.actors import subject_to_gender_beta

    names = [ACTORS[int(i) + 1].name for i in actor_ids]
    return np.stack([subject_to_gender_beta(n)[1] for n in names]).astype(np.float32)
