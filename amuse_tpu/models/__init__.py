"""Model zoo.

Mirrors the reference registry (models/__init__.py:4-10) with JAX modules:
  * "wav_dtw_mfcc"     -> amuse_tpu.models.ast.ASTDisentangler (stage 1)
  * "motionprior"      -> amuse_tpu.models.vae.MotionPrior
  * "latent_diffusion" -> amuse_tpu.models.denoiser.Denoiser (+ schedulers)
"""

from amuse_tpu.models.denoiser import Denoiser, DenoiserConfig  # noqa: F401
from amuse_tpu.models.vae import MotionPrior, PriorConfig  # noqa: F401
