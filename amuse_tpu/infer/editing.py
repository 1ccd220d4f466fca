"""Gesture editing: latent recombination across actors / takes / emotions.

Re-design of the three editing tasks driven by
``PretrainedLPDM_v1.process_loader`` (models/latent_diffusion/infer_ldm.py:225-414)
and consumed by trainer.eval_prior_latdiff_forward_backward_v1
(scripts/trainer.py:545-1034):

  * emotion_control       - one actor; for each take, re-generate with the
    emotion latent of every *other* take (same content + style)
    (infer_ldm.py:404-408, trainer.py:839-901).
  * style_transfer        - two actors, same emotion; exchange latents
    between them. Reference quirk preserved behind a flag: its "style
    transfer" assigns emo<->sty crosswise (stores the partner's *emotion*
    feature into the ``sty`` slot and vice versa, infer_ldm.py:371-381),
    whereas style_Xemo_transfer swaps them straight.
  * style_Xemo_transfer   - two actors, two emotions; swap emotion+style
    latents across both axes (infer_ldm.py:296-318).

All take/actor bookkeeping is host-side Python; every generation request
bottoms out in the same fused DDIM program (GesturePipeline), batched over
windows x edit variants.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import numpy as np

from amuse_tpu.core import motion as motion_mod
from amuse_tpu.infer.pipeline import GesturePipeline


@dataclass
class TakeLatents:
    """Per-take encoded state (the reference's ld_z* dict entries)."""

    actor: str
    take: str
    emo_label: int
    con: np.ndarray  # (n_windows, 256)
    emo: np.ndarray
    sty: np.ndarray
    z_motion: Optional[np.ndarray] = None  # (n_windows, 1, 128)
    extra: dict = field(default_factory=dict)


def encode_take(
    pipe: GesturePipeline,
    actor: str,
    take: str,
    emo_label: int,
    waveform: np.ndarray,
    motion_aa: Optional[np.ndarray] = None,  # (T, 168) raw aa+trans
    seed: int = 0,
) -> TakeLatents:
    """Audio (+ optionally motion) -> latents; = _loader_helper_v1
    (infer_ldm.py:416-493) with batched windows."""
    from amuse_tpu.audio import fbank as fbank_mod

    chunks = fbank_mod.window_waveform(waveform)
    cond = pipe.encode_audio(np.asarray(chunks, np.float32))
    con, emo, sty = (np.asarray(cond[k]) for k in ("con", "emo", "sty"))
    z_motion = None
    if motion_aa is not None:
        windows = motion_mod.window_motion(np.asarray(motion_aa, np.float32))
        feats = pipe.motion_feats(windows)  # rep the prior was trained on
        n = min(len(chunks), feats.shape[0])
        z_motion = np.asarray(pipe.encode_motion(jax.random.key(seed), feats[:n]))
        con, emo, sty = con[:n], emo[:n], sty[:n]
    return TakeLatents(actor, take, emo_label, con, emo, sty, z_motion)


def generate_with(
    pipe: GesturePipeline,
    con: np.ndarray,
    emo: np.ndarray,
    sty: np.ndarray,
    seed: int = 0,
):
    """Conditioning -> (poses, trans) via the fused DDIM program."""
    import jax.numpy as jnp

    latents = pipe.generate_latents(
        jax.random.key(seed), jnp.asarray(con), jnp.asarray(emo), jnp.asarray(sty)
    )
    poses, trans = pipe.decode_motion(latents)
    return np.asarray(poses), np.asarray(trans)


# ------------------------------------------------------------------ tasks


def emotion_control(
    pipe: GesturePipeline, takes: list[TakeLatents], seed: int = 0
) -> dict[str, dict]:
    """For each take: own generation + regeneration under every other take's
    emotion latent (infer_ldm.py:404-408)."""
    out: dict[str, dict] = {}
    for tk in takes:
        n = min(len(tk.con), *(len(o.emo) for o in takes))
        results = {
            "self": generate_with(pipe, tk.con[:n], tk.emo[:n], tk.sty[:n], seed)
        }
        for other in takes:
            if other.take == tk.take:
                continue
            results[f"emo_{other.take}"] = generate_with(
                pipe, tk.con[:n], other.emo[:n], tk.sty[:n], seed
            )
        out[f"{tk.actor}_{tk.take}"] = results
    return out


def style_transfer(
    pipe: GesturePipeline,
    a1_takes: list[TakeLatents],
    a2_takes: list[TakeLatents],
    seed: int = 0,
    reference_quirk: bool = True,
) -> dict[str, dict]:
    """Two actors, same emotion, two takes: exchange style (and emotion)
    latents between partners (infer_ldm.py:338-381).

    reference_quirk=True reproduces the crosswise emo<->sty assignment the
    reference ships with; False performs the evident straight swap.
    """
    if len(a1_takes) != len(a2_takes):
        import warnings

        n_pairs = min(len(a1_takes), len(a2_takes))
        warnings.warn(
            f"style_transfer: actors have {len(a1_takes)} vs {len(a2_takes)} "
            f"takes; only the first {n_pairs} of each are paired - the "
            "remaining takes produce no output",
            stacklevel=2,
        )
    out: dict[str, dict] = {}
    for tk, partner in list(zip(a1_takes, a2_takes)) + list(zip(a2_takes, a1_takes)):
        n = min(len(tk.con), len(partner.con))
        if reference_quirk:
            # partner's emotion feature lands in the style slot & vice versa
            swapped_sty, swapped_emo = partner.emo[:n], partner.sty[:n]
        else:
            swapped_sty, swapped_emo = partner.sty[:n], partner.emo[:n]
        out[f"{tk.actor}_{tk.take}"] = {
            "self": generate_with(pipe, tk.con[:n], tk.emo[:n], tk.sty[:n], seed),
            f"sty_{partner.actor}": generate_with(
                pipe, tk.con[:n], swapped_emo, swapped_sty, seed
            ),
        }
    return out


def style_xemo_transfer(
    pipe: GesturePipeline,
    a1_t1: TakeLatents,
    a1_t2: TakeLatents,
    a2_t1: TakeLatents,
    a2_t2: TakeLatents,
    seed: int = 0,
) -> dict[str, dict]:
    """Two actors x two emotions: straight swap of emotion+style latents
    across both (infer_ldm.py:296-318): a1_t1 takes a2_t2's emo+sty etc."""
    pairs = [
        (a1_t1, a2_t2),
        (a2_t1, a1_t2),
        (a1_t2, a2_t1),
        (a2_t2, a1_t1),
    ]
    out: dict[str, dict] = {}
    for tk, donor in pairs:
        n = min(len(tk.con), len(donor.con))
        out[f"{tk.actor}_{tk.take}"] = {
            "self": generate_with(pipe, tk.con[:n], tk.emo[:n], tk.sty[:n], seed),
            f"xfer_{donor.actor}_{donor.take}": generate_with(
                pipe, tk.con[:n], donor.emo[:n], donor.sty[:n], seed
            ),
        }
    return out


def content_control(
    pipe: GesturePipeline, takes: list[TakeLatents], seed: int = 0
) -> dict[str, dict]:
    """Swap the *content* latent across takes, keeping emotion + style.

    The reference declares this task (config flag test.content_control,
    infer_ldm.py:45) but never implements it; provided here for the complete
    editing matrix (the "combination 4" of infer_ldm.py's own docstring).
    """
    out: dict[str, dict] = {}
    for tk in takes:
        n = min(len(tk.con), *(len(o.con) for o in takes))
        results = {
            "self": generate_with(pipe, tk.con[:n], tk.emo[:n], tk.sty[:n], seed)
        }
        for other in takes:
            if other.take == tk.take:
                continue
            results[f"con_{other.take}"] = generate_with(
                pipe, other.con[:n], tk.emo[:n], tk.sty[:n], seed
            )
        out[f"{tk.actor}_{tk.take}"] = results
    return out


def demo_emotion_swap(
    pipe: GesturePipeline,
    source_wave: np.ndarray,
    target_wave: np.ndarray,
    seed: int = 0,
):
    """The shipped demo path (trainer.py:1037-1098): generate for the source
    audio with its own content/style but the *target* audio's emotion."""
    from amuse_tpu.audio import fbank as fbank_mod

    src = pipe.encode_audio(np.asarray(fbank_mod.window_waveform(source_wave), np.float32))
    tgt = pipe.encode_audio(np.asarray(fbank_mod.window_waveform(target_wave), np.float32))
    n = min(src["con"].shape[0], tgt["emo"].shape[0])
    return {
        "original": generate_with(
            pipe, np.asarray(src["con"][:n]), np.asarray(src["emo"][:n]),
            np.asarray(src["sty"][:n]), seed,
        ),
        "emotion_swapped": generate_with(
            pipe, np.asarray(src["con"][:n]), np.asarray(tgt["emo"][:n]),
            np.asarray(src["sty"][:n]), seed,
        ),
    }
