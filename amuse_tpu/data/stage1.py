"""Stage-1 dataset: (actor1, actor2) x (take1, take2) fbank quads.

Re-design of dm.DTW_align_dm_ast (dm/dm.py:409-520) + the stage-1 side of
``dataload`` (dm/dataload.py:222-248):

  * per take: 10 s chunks -> Kaldi fbank (our jitted front-end, batched on
    device instead of the reference's CPU-loop torchaudio calls),
  * pair construction: all 2-combinations of training actors x the two
    recorded takes of each emotion x common chunk count
    (dm/dm.py:459-498); split = actors policy with the reference's
    val actors {nidal, li, kexin} and dropped {yingqing, goto},
  * normalisation with the recorded BEAT stats; SpecAugment/noise happen
    *inside the jitted train step* (amuse_tpu.train.audio.spec_augment),
    not in the loader - the TPU does the augmentation math.

The built dataset is one npz of fbank quads + labels; at BEAT scale the
fbank pass shards over the mesh like the stage-2 cache build (prepare_data
passes a shard_map'd ``wav_chunk_to_fbank`` as ``fbank_fn``, cli/main.py).
"""

from __future__ import annotations

import itertools
import json
from pathlib import Path
from typing import Iterator, Optional, Sequence

import numpy as np

from amuse_tpu.data import beat as beat_mod
from amuse_tpu.data.actors import (
    ACTORS,
    EMOTIONS,
    PRETRAINED_TAKES,
    STAGE1_DROPPED_ACTORS,
    STAGE1_VAL_ACTORS,
)


def fbanks_per_take(
    takes: Sequence[beat_mod.Take],
    fbank_fn=None,  # (N, 160000) -> (N, 1024, 128) normalised fbanks
) -> dict[tuple[int, str], dict]:
    """{(actor_id, take): {"fbanks": (C, 1024, 128), "emo": int}}.

    The reference drops chunks shorter than 300 fbank frames (dm/dm.py:431);
    here full-chunk windowing + fixed 1024-frame fbank padding make that
    case unrepresentable (the sub-10 s wav guard below is the filter).
    """
    import jax.numpy as jnp

    from amuse_tpu.audio import fbank as fb
    from amuse_tpu.audio.wavio import load_wav_resampled

    if fbank_fn is None:
        fbank_fn = lambda c: np.asarray(fb.wav_chunk_to_fbank(jnp.asarray(c)))  # noqa: E731

    out = {}
    for t in takes:
        if t.wav is None:
            continue
        wave = load_wav_resampled(t.wav)
        if wave.shape[-1] < fb.CHUNK_SAMPLES:
            continue
        chunks = fb.window_waveform(wave)
        fbanks = fbank_fn(chunks.astype(np.float32))
        # NOTE: the reference drops <300-frame chunks (dm/dm.py:431); here
        # window_waveform only emits full 10 s chunks and the fbank pads to
        # exactly 1024 frames, so no equivalent short-chunk case exists -
        # the CHUNK_SAMPLES guard above is the operative filter.
        emo = beat_mod.emotion_label(t.emotion_csv) if t.emotion_csv else 0
        out[(t.actor_id, t.take)] = {"fbanks": fbanks, "emo": emo}
    return out


def build_quads(
    per_take: dict[tuple[int, str], dict],
    split: str = "train",
) -> dict[str, np.ndarray]:
    """Quad records for one split (dm/dm.py:453-498), index-deduplicated.

    Each take's fbank chunks are stored ONCE in a bank and quads are
    (N, 4) index tuples into it - the same take appears in every pairing
    with every other actor (~2x(A-1) quads per take at BEAT scale), so
    materialising 4 full (1024, 128) copies per quad would blow the
    dataset up ~25x (tens of GB at 25 actors). The reference pairs LMDB
    indices for the same reason. ``batches`` gathers at batch time.

    Returns {"fbank_bank": (M, 1024, 128), "quad_idx": (N, 4) int32,
    "emo_id": (N,), "a1_id": (N,), "a2_id": (N,)} with 0-based labels.
    """
    val_ids = {a.index for a in ACTORS.values() if a.name in STAGE1_VAL_ACTORS}
    drop_ids = {a.index for a in ACTORS.values() if a.name in STAGE1_DROPPED_ACTORS}
    if split == "train":
        ids = [i for i in sorted(ACTORS) if i not in val_ids and i not in drop_ids]
    elif split == "val":
        ids = sorted(val_ids)
    else:
        raise ValueError(split)

    bank_chunks: list[np.ndarray] = []
    bank_pos: dict[tuple[int, str, int], int] = {}  # (actor, take, chunk) -> row

    def bank_index(actor: int, take: str, chunk: int) -> int:
        key = (actor, take, chunk)
        if key not in bank_pos:
            bank_pos[key] = len(bank_chunks)
            bank_chunks.append(
                np.asarray(per_take[(actor, take)]["fbanks"][chunk], np.float32)
            )
        return bank_pos[key]

    quad_idx, emo_id, a1_id, a2_id = [], [], [], []
    for a1, a2 in itertools.combinations(ids, 2):
        for emotion in EMOTIONS:
            t1, t2 = PRETRAINED_TAKES[emotion]
            for ta, tb in itertools.combinations((t1, t2), 2):
                entries = [
                    per_take.get((a1, ta)), per_take.get((a1, tb)),
                    per_take.get((a2, ta)), per_take.get((a2, tb)),
                ]
                if any(e is None for e in entries):
                    continue
                n_chunks = min(e["fbanks"].shape[0] for e in entries)
                emos = {e["emo"] for e in entries}
                if len(emos) != 1:
                    continue  # reference asserts equality (dm/dm.py:473-485)
                for c in range(n_chunks):
                    quad_idx.append(
                        [
                            bank_index(a1, ta, c), bank_index(a1, tb, c),
                            bank_index(a2, ta, c), bank_index(a2, tb, c),
                        ]
                    )
                    emo_id.append(entries[0]["emo"])
                    a1_id.append(a1 - 1)
                    a2_id.append(a2 - 1)
    if not quad_idx:
        return {
            "fbank_bank": np.zeros((0, 1024, 128), np.float32),
            "quad_idx": np.zeros((0, 4), np.int32),
            "emo_id": np.zeros(0, np.int32),
            "a1_id": np.zeros(0, np.int32),
            "a2_id": np.zeros(0, np.int32),
        }
    return {
        "fbank_bank": np.stack(bank_chunks),
        "quad_idx": np.asarray(quad_idx, np.int32),
        "emo_id": np.asarray(emo_id, np.int32),
        "a1_id": np.asarray(a1_id, np.int32),
        "a2_id": np.asarray(a2_id, np.int32),
    }


def takes_provenance(takes: Sequence[beat_mod.Take]) -> list[str]:
    """Sorted identity of the wav set a dataset would be built from.

    Identity-only (actor/take stems), matching the reference's
    skip-if-present semantics for its fbank artifacts (dm/dm.py:413-415,
    count check at :334-335): adding/removing takes triggers a rebuild;
    editing a wav or emotion CSV in place does not (delete the npz to force
    one, exactly as upstream).
    """
    return sorted(f"{t.actor_id}/{t.take}" for t in takes if t.wav is not None)


def _npz_path(path) -> Path:
    """The file np.savez_compressed actually writes: numpy appends ``.npz``
    to suffix-less names, so every reader/skip-check must normalise the
    same way or a configured ``stage1_dataset: "stage1"`` would silently
    never skip (and never load)."""
    p = Path(path)
    return p if p.name.endswith(".npz") else p.with_name(p.name + ".npz")


def save_dataset(
    path: Path, train: dict, val: dict, provenance: Optional[list] = None
) -> None:
    # provenance=None means "unknown origin": store null so
    # dataset_is_current never treats it as matching any take set (an
    # empty LIST is a genuinely-empty take set and does match []).
    meta = json.dumps({"takes": None if provenance is None else list(provenance)})
    np.savez_compressed(
        _npz_path(path),
        __meta__=np.frombuffer(meta.encode(), np.uint8),
        **{f"train_{k}": v for k, v in train.items()},
        **{f"val_{k}": v for k, v in val.items()},
    )


def dataset_is_current(path: Path, provenance: list) -> bool:
    """True when ``path`` exists and was built from exactly ``provenance``.

    Lets prepare_data skip the stage-1 fbank pass (the expensive leg at
    BEAT scale) on re-runs, like the stage-2 cache's skip-if-built
    manifest. Legacy datasets without provenance (or saved with
    provenance=None) rebuild once. Identity-only semantics: see
    ``takes_provenance``.
    """
    p = _npz_path(path)
    if not p.exists():
        return False
    try:
        with np.load(p) as d:
            if "__meta__" not in d.files:
                return False
            meta = json.loads(bytes(d["__meta__"]).decode())
    except Exception:
        return False  # unreadable/corrupt -> rebuild
    return meta.get("takes") is not None and meta["takes"] == list(provenance)


def load_dataset(path: Path) -> tuple[dict, dict]:
    d = np.load(_npz_path(path))
    train = {k[len("train_"):]: d[k] for k in d.files if k.startswith("train_")}
    val = {k[len("val_"):]: d[k] for k in d.files if k.startswith("val_")}
    return train, val


def batches(
    data: dict[str, np.ndarray],
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
) -> Iterator[dict[str, np.ndarray]]:
    """Yields {"fbanks": (B, 4, 1024, 128), "emo_id", "a1_id", "a2_id"}.

    Accepts both the index-deduplicated layout (fbank_bank + quad_idx,
    gathered here at batch time) and the legacy materialised layout
    (a full "fbanks" array) for old dataset files.
    """
    n = data["emo_id"].shape[0]
    order = np.arange(n)
    if rng is not None:
        rng.shuffle(order)
    labels = ("emo_id", "a1_id", "a2_id")
    for i in range(0, n - batch_size + 1, batch_size):
        idx = order[i : i + batch_size]
        out = {k: data[k][idx] for k in labels if k in data}
        if "fbank_bank" in data:
            out["fbanks"] = data["fbank_bank"][data["quad_idx"][idx]]
        else:
            out["fbanks"] = data["fbanks"][idx]
        yield out
