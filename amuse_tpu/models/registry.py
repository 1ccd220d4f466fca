"""Model registry: the reference's ``allmodels`` dict (models/__init__.py:4-10).

Maps task tags to constructors so the CLI/trainer resolve models uniformly.
Constructors are lazy (imports deferred) to keep CLI startup light.
"""

from __future__ import annotations

from typing import Callable


def _ast():
    from amuse_tpu.models.ast import ASTDisentangler

    return ASTDisentangler


def _motionprior():
    from amuse_tpu.models.vae import MotionPrior

    return MotionPrior


def _denoiser():
    from amuse_tpu.models.denoiser import Denoiser

    return Denoiser


def _raw_diffusion():
    from amuse_tpu.models.raw_diffusion import RawPoseDenoiser

    return RawPoseDenoiser


def _wav_mfcc_legacy():
    from amuse_tpu.models.audio_legacy import AutoEncoder3x

    return AutoEncoder3x


REGISTRY: dict[str, Callable] = {
    # flagship tags (reference: models/__init__.py allmodels)
    "wav_dtw_mfcc": _ast,            # stage-1 AST disentangler
    "motionprior": _motionprior,     # stage-2 VAE
    "latent_diffusion": _denoiser,   # stage-2 denoiser
    # legacy families
    "diffusion": _raw_diffusion,     # raw-pose MDM-style baseline
    "wav_mfcc": _wav_mfcc_legacy,    # pre-AST conv disentangler
}


def get_model(tag: str):
    """Resolve a tag to its model class (raises KeyError on unknown tags)."""
    return REGISTRY[tag]()

