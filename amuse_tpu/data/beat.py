"""BEAT dataset discovery and take-level metadata.

Re-provides the reference ``dm`` class's path discovery / filtering layer
(dm/dm.py:145-307): walk a BEAT-style data root laid out as
``<root>/<actor_id>/<actor_id>_<name>_<lang>_<take>_<take>.{wav,bvh,csv,...}``,
keep English takes, attach emotion labels from the per-take emotion CSV
(last value of the final row, dm/dm.py:347-355).

Everything is plain host-side metadata; heavy artefacts are built by
amuse_tpu.data.cache.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from amuse_tpu.data.actors import ACTORS, PRETRAINED_TAKE_NUMBERS


@dataclass(frozen=True)
class Take:
    actor_id: int
    actor_name: str
    take: str  # e.g. "0_9_9"
    wav: Optional[Path]
    bvh: Optional[Path]
    emotion_csv: Optional[Path]
    mosh_npz: Optional[Path]  # SMPL-X MoSh motion, if extracted

    @property
    def take_number(self) -> str:
        return self.take.split("_")[-1]

    @property
    def is_english(self) -> bool:
        # BEAT file stems: <actor>_<name>_<lang>_<take>_<take>; lang 0 = EN
        return self.take.split("_")[0] == "0"


def emotion_label(csv_path: Path) -> int:
    """Emotion id from the BEAT per-take CSV: last value of the final row
    (dm/dm.py:347-355). Malformed/empty CSVs default to 0 (neutral) with a
    warning instead of aborting a whole dataset build."""
    rows = np.atleast_2d(np.genfromtxt(csv_path, delimiter=","))
    if rows.size == 0 or not np.isfinite(rows[-1, -1]):
        import warnings

        warnings.warn(f"unparseable emotion CSV {csv_path}; defaulting to 0",
                      stacklevel=2)
        return 0
    return int(rows[-1, -1])


def discover(
    data_root: Path,
    mosh_root: Optional[Path] = None,
    english_only: bool = True,
) -> list[Take]:
    """Walk the BEAT tree -> Take records (dm/dm.py:145-307 equivalent)."""
    data_root = Path(data_root)
    takes: list[Take] = []
    for actor_id, actor in sorted(ACTORS.items()):
        actor_dir = data_root / str(actor_id)
        if not actor_dir.is_dir():
            continue
        for wav in sorted(actor_dir.glob("*.wav")):
            parts = wav.stem.split("_")
            take = "_".join(parts[2:])
            t = Take(
                actor_id=actor_id,
                actor_name=actor.name,
                take=take,
                wav=wav,
                bvh=wav.with_suffix(".bvh") if wav.with_suffix(".bvh").exists() else None,
                emotion_csv=(
                    wav.with_suffix(".csv") if wav.with_suffix(".csv").exists() else None
                ),
                mosh_npz=(
                    Path(mosh_root) / f"{wav.stem}.npz"
                    if mosh_root and (Path(mosh_root) / f"{wav.stem}.npz").exists()
                    else None
                ),
            )
            if english_only and not t.is_english:
                continue
            takes.append(t)
    return takes


def stage2_subset(takes: list[Take]) -> list[Take]:
    """Flagship stage-2 filter (dm/dm.py:524-556): the 25 MoSh'd actors,
    2 takes per emotion, with both motion and audio present."""
    from amuse_tpu.data.actors import STAGE2_ACTOR_IDS

    return [
        t
        for t in takes
        if t.actor_id in STAGE2_ACTOR_IDS
        and t.take_number in PRETRAINED_TAKE_NUMBERS
        and t.mosh_npz is not None
        and t.wav is not None
    ]


def load_mosh_motion(npz_path: Path, fps: float = 30.0) -> np.ndarray:
    """MoSh npz -> (T, 168) [55 joints aa | trans] at ``fps`` (dm/dm.py:558-575).

    Honors a recorded ``mocap_frame_rate``: the downstream cache pairs
    300-frame windows with 10 s audio chunks, which is only correct at
    30 fps. A 120 fps capture (BEAT's native BVH rate, e.g. written by
    ``--fn bvh2smplx_``) downsamples by its integer stride; a rate that is
    not an integer multiple of ``fps`` raises instead of silently training
    on audio/motion pairs offset by the rate ratio.
    """
    d = np.load(npz_path, allow_pickle=True)
    poses = np.asarray(d["poses"], np.float32)  # (T, 165)
    trans = np.asarray(d["trans"], np.float32)  # (T, 3)
    rate = float(np.asarray(d["mocap_frame_rate"]).reshape(())) if "mocap_frame_rate" in d else fps
    if rate != fps:
        stride = rate / fps
        if abs(stride - round(stride)) > 1e-6 or stride < 1:
            raise ValueError(
                f"{npz_path}: mocap_frame_rate={rate} is not an integer "
                f"multiple of the pipeline fps={fps}; resample the npz"
            )
        stride = int(round(stride))
        poses, trans = poses[::stride], trans[::stride]
    n = min(poses.shape[0], trans.shape[0])
    return np.concatenate([poses[:n], trans[:n]], axis=-1)
