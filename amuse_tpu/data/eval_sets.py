"""Editing-task evaluation set construction.

Re-design of dm.latent_diffusion_eval_dm_v1 (dm/dm.py:694-755) + the dict
builders in dm/utils/ldm_evals.py:161-248 (style_transfer_dict,
emotion_control_dict, style_Xemo_transfer_dict): select the actor/take
combinations each editing task needs and load their motion + waveform,
producing the inputs for amuse_tpu.infer.editing.encode_take.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Optional

import numpy as np

from amuse_tpu.data import beat as beat_mod
from amuse_tpu.data.actors import PRETRAINED_TAKES, takes_for_emotion


@dataclass(frozen=True)
class EvalItem:
    actor: str
    take: str
    emotion: str
    waveform: np.ndarray  # (C, N) float32 @16 kHz
    motion: Optional[np.ndarray]  # (T, 168) or None


def _load_item(take: beat_mod.Take, emotion: str) -> EvalItem:
    from amuse_tpu.audio.wavio import load_wav_resampled

    wave = load_wav_resampled(take.wav)
    motion = beat_mod.load_mosh_motion(take.mosh_npz) if take.mosh_npz else None
    return EvalItem(take.actor_name, take.take, emotion, wave, motion)


def _find(takes: list[beat_mod.Take], actor: str, take: str) -> Optional[beat_mod.Take]:
    for t in takes:
        if t.actor_name == actor and t.take == take:
            return t
    return None


def emotion_control_set(
    takes: list[beat_mod.Take], actor: str, emotions: Optional[list[str]] = None
) -> list[EvalItem]:
    """One actor, first take of each requested emotion (ldm_evals
    emotion_control_dict: per-take cross-wiring happens in infer.editing).

    Emotions whose take is absent from the tree are skipped with a warning
    (the reference KeyErrors deep inside process_loader instead)."""
    import warnings

    emotions = emotions or list(PRETRAINED_TAKES)
    items = []
    for emo in emotions:
        t = _find(takes, actor, takes_for_emotion(emo)[0])
        if t is not None:
            items.append(_load_item(t, emo))
        else:
            warnings.warn(
                f"emotion_control_set: take {takes_for_emotion(emo)[0]} "
                f"({emo}) missing for actor {actor}; emotion skipped",
                stacklevel=2,
            )
    return items


def style_transfer_set(
    takes: list[beat_mod.Take], actor1: str, actor2: str, emotion: str
) -> tuple[list[EvalItem], list[EvalItem]]:
    """Two actors x the two takes of one emotion (style_transfer_dict).

    An actor with fewer than both takes present contributes what exists
    (warned); infer.editing.style_transfer pairs the min of the two lists."""
    import warnings

    t1, t2 = takes_for_emotion(emotion)
    a1 = [_load_item(_find(takes, actor1, t), emotion) for t in (t1, t2) if _find(takes, actor1, t)]
    a2 = [_load_item(_find(takes, actor2, t), emotion) for t in (t1, t2) if _find(takes, actor2, t)]
    for actor, found in ((actor1, a1), (actor2, a2)):
        if len(found) < 2:
            warnings.warn(
                f"style_transfer_set: actor {actor} has {len(found)}/2 "
                f"{emotion} takes ({t1}, {t2}) in the tree",
                stacklevel=2,
            )
    return a1, a2


def style_xemo_set(
    takes: list[beat_mod.Take], actor1: str, actor2: str, emotion1: str, emotion2: str,
    rng: Optional[np.random.Generator] = None,
) -> dict[str, EvalItem]:
    """Two actors x two emotions -> the 4-corner dict (style_Xemo_transfer_dict).

    Keys: a1_e1, a1_e2, a2_e1, a2_e2; the straight emo+sty swap across the
    diagonal happens in infer.editing.style_xemo_transfer.

    ``rng`` reproduces the reference's per-replication take draw
    (``train_takes_dict[emo][np.random.randint(2)]``, ldm_evals.py:243):
    each rep samples which of an emotion's two takes represents it. Without
    rng the first take is used (deterministic single-shot behaviour).
    """
    if rng is None:
        t_e1, t_e2 = takes_for_emotion(emotion1)[0], takes_for_emotion(emotion2)[0]
    else:
        t_e1 = takes_for_emotion(emotion1)[int(rng.integers(2))]
        t_e2 = takes_for_emotion(emotion2)[int(rng.integers(2))]
    out = {}
    for key, actor, take, emo in [
        ("a1_e1", actor1, t_e1, emotion1),
        ("a1_e2", actor1, t_e2, emotion2),
        ("a2_e1", actor2, t_e1, emotion1),
        ("a2_e2", actor2, t_e2, emotion2),
    ]:
        t = _find(takes, actor, take)
        if t is None:
            raise FileNotFoundError(f"take {take} for actor {actor} not found")
        out[key] = _load_item(t, emo)
    return out
