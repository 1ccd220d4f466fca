"""BEAT dataset actor / emotion metadata tables.

Public facts about the BEAT mocap dataset (30 actors, 8 scripted emotions,
take numbering) used across the pipeline, equivalent to the reference's
tables in dm/dm.py:43-75 and dm/utils/ldm_evals.py:4-154.

Per-actor 300-dim MoSh betas are *dataset-derived artefacts* (the reference
hardcodes ~1800 lines of them in ldm_evals.py:457-2300). The 26 actors the
reference ships betas for are vendored in ``actor_betas.npz`` next to this
module (numeric data, not code); the remaining 4 (zhang, jaime, kexin,
hanieh) have no betas upstream either (``fetchbetas`` raises for them,
ldm_evals.py:362,367,371,376) - we warn loudly and fall back to zeros for
those instead of crashing. ``AMUSE_TPU_BETAS`` overrides the table path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from pathlib import Path

import numpy as np

NUM_BETAS = 300


@dataclass(frozen=True)
class Actor:
    index: int
    name: str
    gender: str
    country: str
    native: bool
    age: int
    ethnicity: str


# BEAT v1 actor roster: 15 male / 15 female.
ACTORS: dict[int, Actor] = {
    a.index: a
    for a in [
        Actor(1, "wayne", "male", "US", True, 25, "Caucasian"),
        Actor(2, "scott", "male", "US", True, 32, "Caucasian"),
        Actor(3, "solomon", "male", "US", True, 40, "African"),
        Actor(4, "lawrence", "male", "Australia", True, 26, "Asian"),
        Actor(5, "stewart", "male", "UK", True, 30, "Caucasian"),
        Actor(6, "carla", "female", "US", True, 27, "Caucasian"),
        Actor(7, "sophie", "female", "US", True, 30, "Caucasian"),
        Actor(8, "catherine", "female", "US", True, 31, "Asian"),
        Actor(9, "miranda", "female", "UK", True, 32, "Caucasian"),
        Actor(10, "kieks", "female", "UK", True, 35, "Caucasian"),
        Actor(11, "nidal", "male", "Arab", False, 38, "African"),
        Actor(12, "zhao", "male", "Thailand", False, 32, "Asian"),
        Actor(13, "lu", "male", "China", False, 25, "Asian"),
        Actor(14, "zhang", "male", "China", False, 24, "Asian"),
        Actor(15, "carlos", "male", "China", False, 40, "Asian"),
        Actor(16, "jorge", "male", "China", False, 32, "Asian"),
        Actor(17, "itoi", "male", "Japan", False, 32, "Asian"),
        Actor(18, "daiki", "male", "Japan", False, 22, "Asian"),
        Actor(19, "jaime", "male", "Peru", False, 27, "Caucasian"),
        Actor(20, "li", "male", "Spain", False, 30, "Caucasian"),
        Actor(21, "ayana", "female", "China", False, 31, "Asian"),
        Actor(22, "luqi", "female", "China", False, 24, "Asian"),
        Actor(23, "hailing", "female", "China", False, 26, "Asian"),
        Actor(24, "kexin", "female", "China", False, 32, "Asian"),
        Actor(25, "goto", "female", "Japan", False, 24, "Asian"),
        Actor(26, "reamey", "female", "Japan", False, 26, "Asian"),
        Actor(27, "yingqing", "female", "Iran", False, 31, "African"),
        Actor(28, "tiffnay", "female", "Jamaica", False, 33, "African"),
        Actor(29, "hanieh", "female", "Jamaica", False, 24, "Asian"),
        Actor(30, "katya", "female", "Russia", False, 25, "Caucasian"),
    ]
}

NAME_TO_ACTOR: dict[str, Actor] = {a.name: a for a in ACTORS.values()}

# Stage-2 flagship training subset (dm/dm.py:524-526): actors minus the 5
# with missing/incorrect MoSh data, 2 takes per emotion.
EXCLUDED_STAGE2_ACTORS = (11, 20, 24, 25, 27)
STAGE2_ACTOR_IDS = tuple(i for i in range(1, 31) if i not in EXCLUDED_STAGE2_ACTORS)

# Stage-1 split (dm/dm.py:455-459): 3 validation actors; 2 dropped for
# incorrect emotion labels.
STAGE1_VAL_ACTORS = ("nidal", "li", "kexin")
STAGE1_DROPPED_ACTORS = ("yingqing", "goto")

# Emotion id order and the recorded takes per emotion (dm/dm.py:443-451).
EMOTIONS = (
    "neutral", "happy", "angry", "sad", "contempt", "surprise", "fear", "disgust"
)
EMOTION_TAKE_RANGES: dict[str, tuple[int, int]] = {
    "neutral": (1, 10),
    "happy": (65, 72),
    "angry": (73, 80),
    "sad": (81, 86),
    "contempt": (87, 94),
    "surprise": (95, 102),
    "fear": (103, 110),
    "disgust": (111, 118),
}
# The two takes/emotion used by the shipped checkpoints (dm/dm.py:443-451,527).
PRETRAINED_TAKES: dict[str, tuple[str, str]] = {
    "neutral": ("0_9_9", "0_10_10"),
    "happy": ("0_65_65", "0_66_66"),
    "angry": ("0_73_73", "0_74_74"),
    "sad": ("0_81_81", "0_82_82"),
    "contempt": ("0_87_87", "0_88_88"),
    "surprise": ("0_95_95", "0_96_96"),
    "fear": ("0_103_103", "0_104_104"),
    "disgust": ("0_111_111", "0_112_112"),
}
PRETRAINED_TAKE_NUMBERS = tuple(
    t.split("_")[-1] for pair in PRETRAINED_TAKES.values() for t in pair
)


def emotion_id(name: str) -> int:
    return EMOTIONS.index(name)


def takes_for_emotion(emotion: str) -> tuple[str, str]:
    return PRETRAINED_TAKES[emotion]


_BETAS_CACHE: dict[str, np.ndarray] | None = None
_WARNED_MISSING: set[str] = set()


def _load_betas() -> dict[str, np.ndarray]:
    global _BETAS_CACHE
    if _BETAS_CACHE is None:
        path = os.environ.get("AMUSE_TPU_BETAS", "") or str(
            Path(__file__).parent / "actor_betas.npz"
        )
        if not Path(path).is_file():
            raise FileNotFoundError(
                f"actor betas table not found at {path} - the bundled "
                "amuse_tpu/data/actor_betas.npz ships with the package; set "
                "AMUSE_TPU_BETAS to point at a replacement"
            )
        d = np.load(path, allow_pickle=False)
        _BETAS_CACHE = {k: np.asarray(d[k], np.float64) for k in d.files}
    return _BETAS_CACHE


def subject_to_gender_beta(subject: str) -> tuple[str, np.ndarray]:
    """actor name -> (gender, (300,) betas); the reference's
    ``subject2genderbeta`` (ldm_evals.py:67-71) backed by the vendored table."""
    import warnings

    actor = NAME_TO_ACTOR.get(subject)
    gender = actor.gender if actor else "neutral"
    betas = _load_betas().get(subject)
    if betas is None:
        if subject not in _WARNED_MISSING:
            _WARNED_MISSING.add(subject)
            warnings.warn(
                f"no MoSh betas for actor {subject!r} (the reference has none "
                "for zhang/jaime/kexin/hanieh either) - using a zero body "
                "shape; rendered mesh and vertex loss will use the template",
                stacklevel=2,
            )
        betas = np.zeros(NUM_BETAS, np.float64)
    return gender, betas


def betas_for_batch(subjects: list[str]) -> np.ndarray:
    """Stacked (N, 300) betas for a batch of actor names (vertex loss input)."""
    return np.stack([subject_to_gender_beta(s)[1] for s in subjects])
