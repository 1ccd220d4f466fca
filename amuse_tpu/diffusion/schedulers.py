"""DDPM / DDIM schedulers as pure JAX, parity with HF diffusers 0.17 configs.

The reference builds a ``diffusers.DDPMScheduler`` for training-time noising
and a ``diffusers.DDIMScheduler`` for 50-step eta=0 sampling
(models/latent_diffusion/ldm.py:41-57, configs/diff_latent_v2.json:48-66).
Here both are NamedTuples of precomputed float32 tables so that noising and
the full sampling loop compile into a single XLA program; the DDIM loop is a
``lax.scan`` in amuse_tpu.diffusion.sampler.

Parity-critical details reproduced exactly:
  * ``scaled_linear`` betas: linspace(sqrt(b0), sqrt(b1), T)**2
  * DDIM "leading" timestep spacing with ``steps_offset=1``:
    t_i = round(i * T/S) + 1, descending -> [981, 961, ..., 21, 1]
  * ``set_alpha_to_one=False``: the final step uses alpha_cumprod[0]
    (not 1.0) as the previous-step alpha
  * ``init_noise_sigma = 1.0`` (initial latents multiplied by 1)
  * epsilon prediction, eta = 0 (deterministic DDIM), and diffusers'
    DEFAULT clip_sample=True for the DDIM sampler (see ddim_step)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    """Precomputed DDPM tables (float32, length = num_train_timesteps)."""

    betas: jax.Array
    alphas_cumprod: jax.Array
    num_train_timesteps: int
    init_noise_sigma: float


def make_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> DiffusionSchedule:
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unsupported beta_schedule: {beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas)
    return DiffusionSchedule(
        betas=jnp.asarray(betas, jnp.float32),
        alphas_cumprod=jnp.asarray(alphas_cumprod, jnp.float32),
        num_train_timesteps=num_train_timesteps,
        init_noise_sigma=1.0,
    )


def add_noise(
    schedule: DiffusionSchedule,
    sample: jax.Array,
    noise: jax.Array,
    timesteps: jax.Array,  # (B,) int
) -> jax.Array:
    """q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1 - acp_t) eps (DDPMScheduler.add_noise)."""
    acp = schedule.alphas_cumprod[timesteps]
    shape = acp.shape + (1,) * (sample.ndim - acp.ndim)
    acp = acp.reshape(shape)
    return jnp.sqrt(acp) * sample + jnp.sqrt(1.0 - acp) * noise


def ddim_timesteps(
    schedule: DiffusionSchedule,
    num_inference_steps: int = 50,
    steps_offset: int = 1,
) -> jax.Array:
    """Descending inference timesteps, diffusers "leading" spacing + offset.

    Validates num_inference_steps <= num_train_timesteps like diffusers'
    set_timesteps (scheduling_ddim.py): beyond it step_ratio floors to 0 and
    the sampler would run S silent no-op steps at t=offset; at S == T the
    offset pushes the first timestep to T, which JAX gather would silently
    clamp to T-1 (torch would IndexError) - also rejected.
    """
    t_train = schedule.num_train_timesteps
    if num_inference_steps > t_train:
        raise ValueError(
            f"num_inference_steps ({num_inference_steps}) must be <= "
            f"num_train_timesteps ({t_train})"
        )
    if num_inference_steps == t_train and steps_offset > 0:
        raise ValueError(
            f"num_inference_steps == num_train_timesteps ({t_train}) with "
            f"steps_offset={steps_offset} indexes alphas_cumprod[{t_train}] "
            "out of bounds; use fewer inference steps"
        )
    step_ratio = t_train // num_inference_steps
    ts = (np.arange(num_inference_steps) * step_ratio).round().astype(np.int64)
    ts = ts[::-1].copy() + steps_offset
    return jnp.asarray(ts, jnp.int32)


def ddim_step(
    schedule: DiffusionSchedule,
    model_output: jax.Array,  # predicted epsilon
    timestep: jax.Array,  # scalar int
    sample: jax.Array,
    num_inference_steps: int = 50,
    eta: float = 0.0,
    set_alpha_to_one: bool = False,
    clip_sample: bool = True,
    clip_sample_range: float = 1.0,
) -> jax.Array:
    """One deterministic DDIM update x_t -> x_{t-dt} (DDIMScheduler.step, eta=0).

    eta > 0 is intentionally unsupported: every shipped config runs eta=0
    (configs/diff_latent_v2.json:65) and the eta=0 branch needs no noise.

    ``clip_sample`` defaults to True because the reference constructs its
    DDIMScheduler WITHOUT overriding it (ldm.py:51-57, infer_ldm.py:116-123)
    and diffusers-0.17.1's default is True: the reference's sampling clamps
    every pred-x0 into [-1, 1]. Only the DDPM (noising) scheduler gets
    clip_sample=false from diff_latent_v2.json:54. Caught by the torch
    diffusers oracle (tests/thirdparty/diffusers_schedulers.py) in round 3.
    """
    assert eta == 0.0, "stochastic DDIM (eta > 0) not used by any shipped config"
    step_ratio = schedule.num_train_timesteps // num_inference_steps
    prev_t = timestep - step_ratio
    alpha_t = schedule.alphas_cumprod[timestep]
    final_alpha = (
        jnp.asarray(1.0, jnp.float32) if set_alpha_to_one else schedule.alphas_cumprod[0]
    )
    alpha_prev = jnp.where(prev_t >= 0, schedule.alphas_cumprod[jnp.maximum(prev_t, 0)], final_alpha)

    pred_x0 = (sample - jnp.sqrt(1.0 - alpha_t) * model_output) / jnp.sqrt(alpha_t)
    if clip_sample:
        pred_x0 = jnp.clip(pred_x0, -clip_sample_range, clip_sample_range)
    direction = jnp.sqrt(1.0 - alpha_prev) * model_output
    return jnp.sqrt(alpha_prev) * pred_x0 + direction
