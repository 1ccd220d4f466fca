"""Test-only oracle: HF diffusers 0.17.1 DDPM/DDIM scheduler semantics in torch.

The reference constructs ``diffusers.DDPMScheduler`` (training-time noising)
and ``diffusers.DDIMScheduler`` (50-step eta=0 sampling) at
models/latent_diffusion/ldm.py:41-57 with the config in
configs/diff_latent_v2.json:48-66.  diffusers is not installed and cannot be
fetched in this sandbox (zero egress), so this module reconstructs the exact
subset of the public Apache-2.0 ``scheduling_ddpm.py`` / ``scheduling_ddim.py``
(diffusers v0.17.1) that the reference exercises, preserving upstream's
numerics decisions:

  * beta tables built with **torch.linspace in float32** (upstream does NOT
    go through float64),
  * ``add_noise`` flattens the gathered sqrt-alpha terms then unsqueezes to
    the sample rank,
  * DDIM ``set_timesteps`` uses the pre-0.19 "leading" spacing
    ``(arange(S) * (T // S)).round()[::-1] + steps_offset``,
  * DDIM ``step`` with ``set_alpha_to_one=False`` falls back to
    ``alphas_cumprod[0]`` for the final step's previous alpha, and the
    eta/variance path follows upstream ``_get_variance``.

It is executed under torch (a genuinely different framework/runtime from the
JAX implementation under test) by tests/test_scheduler_oracle.py and by
tests/goldens/make_scheduler_golden.py, which commits the resulting tables
and a full 50-step DDIM trajectory as goldens.

This file is deliberately torch-idiomatic and structured after upstream so a
reviewer can diff it against the public diffusers 0.17.1 sources; it shares
no code with amuse_tpu (which is pure JAX over precomputed NamedTuple
tables, amuse_tpu/diffusion/schedulers.py).
"""

from __future__ import annotations

import numpy as np
import torch


def _make_betas(
    num_train_timesteps: int, beta_start: float, beta_end: float, beta_schedule: str
) -> torch.Tensor:
    # upstream builds these in float32 directly (scheduling_ddpm.py /
    # scheduling_ddim.py __init__)
    if beta_schedule == "linear":
        return torch.linspace(
            beta_start, beta_end, num_train_timesteps, dtype=torch.float32
        )
    if beta_schedule == "scaled_linear":
        # "this schedule is very specific to the latent diffusion model"
        return (
            torch.linspace(
                beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=torch.float32
            )
            ** 2
        )
    raise NotImplementedError(beta_schedule)


class DDPMScheduler:
    """diffusers 0.17.1 DDPMScheduler — the subset the reference uses.

    The reference only calls ``add_noise`` (ldm.py:85) and reads
    ``config.num_train_timesteps`` (ldm.py:79); the ancestral-sampling
    ``step``/variance machinery is never reached from any shipped task, so
    only the table construction and ``add_noise`` are reconstructed.
    """

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        variance_type: str = "fixed_small",
        clip_sample: bool = True,
        prediction_type: str = "epsilon",
    ):
        self.num_train_timesteps = num_train_timesteps
        self.variance_type = variance_type
        self.clip_sample = clip_sample
        self.prediction_type = prediction_type
        self.betas = _make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        self.one = torch.tensor(1.0)
        self.init_noise_sigma = 1.0

    def add_noise(
        self,
        original_samples: torch.Tensor,
        noise: torch.Tensor,
        timesteps: torch.IntTensor,
    ) -> torch.Tensor:
        alphas_cumprod = self.alphas_cumprod.to(
            device=original_samples.device, dtype=original_samples.dtype
        )
        timesteps = timesteps.to(original_samples.device)

        sqrt_alpha_prod = alphas_cumprod[timesteps] ** 0.5
        sqrt_alpha_prod = sqrt_alpha_prod.flatten()
        while len(sqrt_alpha_prod.shape) < len(original_samples.shape):
            sqrt_alpha_prod = sqrt_alpha_prod.unsqueeze(-1)

        sqrt_one_minus_alpha_prod = (1 - alphas_cumprod[timesteps]) ** 0.5
        sqrt_one_minus_alpha_prod = sqrt_one_minus_alpha_prod.flatten()
        while len(sqrt_one_minus_alpha_prod.shape) < len(original_samples.shape):
            sqrt_one_minus_alpha_prod = sqrt_one_minus_alpha_prod.unsqueeze(-1)

        return sqrt_alpha_prod * original_samples + sqrt_one_minus_alpha_prod * noise


class DDIMScheduler:
    """diffusers 0.17.1 DDIMScheduler — ``set_timesteps`` + ``step``.

    Reconstructs the pre-``timestep_spacing`` (v0.17) behaviour: "leading"
    integer spacing plus ``steps_offset``, ``final_alpha_cumprod`` honouring
    ``set_alpha_to_one``, epsilon prediction, optional clipping, and the
    eta-scaled variance path of upstream ``step``.
    """

    def __init__(
        self,
        num_train_timesteps: int = 1000,
        beta_start: float = 0.0001,
        beta_end: float = 0.02,
        beta_schedule: str = "linear",
        clip_sample: bool = True,
        set_alpha_to_one: bool = True,
        steps_offset: int = 0,
        prediction_type: str = "epsilon",
        clip_sample_range: float = 1.0,
    ):
        self.num_train_timesteps = num_train_timesteps
        self.clip_sample = clip_sample
        self.steps_offset = steps_offset
        self.prediction_type = prediction_type
        self.clip_sample_range = clip_sample_range
        self.betas = _make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
        self.alphas = 1.0 - self.betas
        self.alphas_cumprod = torch.cumprod(self.alphas, dim=0)
        # At every step below that one, the previous alpha product comes from
        # the table; the very first (t -> "t-1 < 0") step uses this instead.
        self.final_alpha_cumprod = (
            torch.tensor(1.0) if set_alpha_to_one else self.alphas_cumprod[0]
        )
        self.init_noise_sigma = 1.0
        self.num_inference_steps: int | None = None
        self.timesteps = torch.from_numpy(
            np.arange(0, num_train_timesteps)[::-1].copy().astype(np.int64)
        )

    def set_timesteps(self, num_inference_steps: int):
        if num_inference_steps > self.num_train_timesteps:
            raise ValueError("num_inference_steps > num_train_timesteps")
        self.num_inference_steps = num_inference_steps
        step_ratio = self.num_train_timesteps // num_inference_steps
        # creates integer timesteps by multiplying by ratio; rounded to avoid
        # issues when num_inference_steps is a power of 3 (upstream comment)
        timesteps = (
            (np.arange(0, num_inference_steps) * step_ratio)
            .round()[::-1]
            .copy()
            .astype(np.int64)
        )
        self.timesteps = torch.from_numpy(timesteps)
        self.timesteps += self.steps_offset

    def _get_variance(self, timestep: int, prev_timestep: int) -> torch.Tensor:
        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_timestep]
            if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1 - alpha_prod_t
        beta_prod_t_prev = 1 - alpha_prod_t_prev
        return (beta_prod_t_prev / beta_prod_t) * (1 - alpha_prod_t / alpha_prod_t_prev)

    def step(
        self,
        model_output: torch.Tensor,
        timestep: int,
        sample: torch.Tensor,
        eta: float = 0.0,
        generator: torch.Generator | None = None,
    ) -> torch.Tensor:
        """Returns ``prev_sample`` (upstream wraps it in a SchedulerOutput)."""
        if self.num_inference_steps is None:
            raise ValueError("call set_timesteps first")
        prev_timestep = timestep - self.num_train_timesteps // self.num_inference_steps

        alpha_prod_t = self.alphas_cumprod[timestep]
        alpha_prod_t_prev = (
            self.alphas_cumprod[prev_timestep]
            if prev_timestep >= 0
            else self.final_alpha_cumprod
        )
        beta_prod_t = 1 - alpha_prod_t

        if self.prediction_type == "epsilon":
            pred_original_sample = (
                sample - beta_prod_t ** (0.5) * model_output
            ) / alpha_prod_t ** (0.5)
            pred_epsilon = model_output
        else:
            raise NotImplementedError(self.prediction_type)

        if self.clip_sample:
            pred_original_sample = pred_original_sample.clamp(
                -self.clip_sample_range, self.clip_sample_range
            )

        variance = self._get_variance(timestep, prev_timestep)
        std_dev_t = eta * variance ** (0.5)

        pred_sample_direction = (1 - alpha_prod_t_prev - std_dev_t**2) ** (
            0.5
        ) * pred_epsilon
        prev_sample = (
            alpha_prod_t_prev ** (0.5) * pred_original_sample + pred_sample_direction
        )

        if eta > 0:
            noise = torch.randn(
                model_output.shape, generator=generator, dtype=model_output.dtype
            )
            prev_sample = prev_sample + std_dev_t * noise
        return prev_sample
