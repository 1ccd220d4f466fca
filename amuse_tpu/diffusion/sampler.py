"""DDIM sampling as a single ``lax.scan`` program.

The reference runs a Python loop of 50 sequential denoiser calls per sample
(ldm.py:139-151, infer_ldm.py:150-161) - and, unusually, *inside every
stage-2 training step* as a no-grad monitor pass (trainer.py:413-415). Here
the loop is a ``lax.scan`` over precomputed timesteps so XLA compiles one
fused program: on TPU the 50 steps run back-to-back on-device with zero host
round-trips.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from amuse_tpu.diffusion.schedulers import (
    DiffusionSchedule,
    ddim_step,
    ddim_timesteps,
)

# model_fn(latents, timestep) -> predicted epsilon; conditioning is closed over.
DenoiseFn = Callable[[jax.Array, jax.Array], jax.Array]


def ddim_sample(
    schedule: DiffusionSchedule,
    denoise_fn: DenoiseFn,
    rng: jax.Array,
    shape: tuple[int, ...],
    num_inference_steps: int = 50,
    steps_offset: int = 1,
    clip_sample: bool = True,
    initial_latents: Optional[jax.Array] = None,
) -> jax.Array:
    """Draw x_0 by 50-step deterministic DDIM from N(0, I) latents.

    Matches ldm.py:118-153: latents ~ N(0,1) * init_noise_sigma(=1), then the
    eta=0 DDIM update per timestep. ``clip_sample=True`` mirrors the
    reference's un-overridden diffusers DDIMScheduler default (pred-x0
    clamped to [-1, 1] each step — see ddim_step's docstring).
    ``initial_latents`` replaces the N(0,1) draw for strict A/B against a
    torch run's recorded init (tools/parity_report.py --latents-npz).
    """
    timesteps = ddim_timesteps(schedule, num_inference_steps, steps_offset)
    latents = (
        initial_latents
        if initial_latents is not None
        else jax.random.normal(rng, shape, jnp.float32) * schedule.init_noise_sigma
    )

    def body(latents, t):
        eps = denoise_fn(latents, t)
        latents = ddim_step(
            schedule, eps, t, latents, num_inference_steps, clip_sample=clip_sample
        )
        return latents, None

    latents, _ = jax.lax.scan(body, latents, timesteps)
    return latents
