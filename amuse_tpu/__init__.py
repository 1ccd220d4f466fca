"""AMUSE-TPU: a TPU-native framework for emotional speech-driven 3D body animation.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of AMUSE
(CVPR 2024, reference: kiranchhatre/amuse): a two-stage pipeline that

  1. disentangles a 10 s log-mel spectrogram into content / emotion /
     person-style embeddings with a triple Audio-Spectrogram-Transformer
     (stage 1, ``amuse_tpu.models.ast``), and
  2. generates 300-frame SMPL-X gesture windows with a transformer motion
     prior VAE + latent DDPM/DDIM denoiser conditioned on those embeddings
     (stage 2, ``amuse_tpu.models.vae`` / ``amuse_tpu.models.denoiser`` /
     ``amuse_tpu.diffusion``).

Everything in the compute path is pure-functional JAX designed for TPU:
bf16 matmuls on the MXU, `lax.scan` DDIM sampling, `pjit` data-parallel
training over an ICI mesh, and Pallas kernels for the hot attention ops.
"""

__version__ = "0.1.0"
