"""Full Gaussian diffusion toolkit (the raw-pose baseline's core).

JAX re-design of the reference's vendored OpenAI diffusion stack
(models/diffusion/utils/mdm_gaussian_diffusion.py:181-1781,
mdm_respace.py:8-121, mdm_resample.py:23-154), which powers the legacy
"diffusion" tag (MDM-style raw pose diffusion, models/diffusion/). Provided
as first-class functionality rather than 1.8k lines of vendored code:

  * beta schedules: linear (scaled to the timestep count) and cosine,
  * q(x_t | x_0) sampling, true posterior q(x_{t-1} | x_t, x_0),
  * training losses for epsilon- and x0-prediction,
  * ancestral DDPM sampling and respaced DDIM sampling - both lax.scan,
  * importance-weighted timestep sampling (loss-second-moment resampler)
    as a pure-functional state update (no torch.distributed all_gather -
    under SPMD every replica already sees the same running statistics).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


def linear_betas(num_timesteps: int, scale_ref: int = 1000) -> np.ndarray:
    """OpenAI 'linear' schedule, scaled so any T matches the 1000-step shape."""
    scale = scale_ref / num_timesteps
    return np.linspace(scale * 1e-4, scale * 0.02, num_timesteps, dtype=np.float64)


def cosine_betas(num_timesteps: int, s: float = 0.008) -> np.ndarray:
    t = np.arange(num_timesteps + 1, dtype=np.float64) / num_timesteps
    f = np.cos((t + s) / (1 + s) * np.pi / 2) ** 2
    betas = 1.0 - f[1:] / f[:-1]
    return np.clip(betas, 0.0, 0.999)


class GaussianDiffusion(NamedTuple):
    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_gaussian_diffusion(betas: np.ndarray) -> GaussianDiffusion:
    betas = np.asarray(betas, np.float64)
    acp = np.cumprod(1.0 - betas)
    acp_prev = np.concatenate([[1.0], acp[:-1]])
    post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
    post_logvar = np.log(np.concatenate([[post_var[1]], post_var[1:]]))
    coef1 = betas * np.sqrt(acp_prev) / (1.0 - acp)
    coef2 = (1.0 - acp_prev) * np.sqrt(1.0 - betas) / (1.0 - acp)
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    return GaussianDiffusion(
        f32(betas), f32(acp), f32(acp_prev), f32(post_var),
        f32(post_logvar), f32(coef1), f32(coef2),
    )


def _extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    return table[t].reshape(t.shape + (1,) * (ndim - t.ndim))


def q_sample(gd: GaussianDiffusion, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    acp = _extract(gd.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise


def predict_x0_from_eps(gd: GaussianDiffusion, x_t: jax.Array, t: jax.Array, eps: jax.Array) -> jax.Array:
    acp = _extract(gd.alphas_cumprod, t, x_t.ndim)
    return (x_t - jnp.sqrt(1.0 - acp) * eps) / jnp.sqrt(acp)


def q_posterior_mean(gd: GaussianDiffusion, x0: jax.Array, x_t: jax.Array, t: jax.Array) -> jax.Array:
    c1 = _extract(gd.posterior_mean_coef1, t, x0.ndim)
    c2 = _extract(gd.posterior_mean_coef2, t, x0.ndim)
    return c1 * x0 + c2 * x_t


def training_loss(
    gd: GaussianDiffusion,
    model_fn: Callable,  # (x_t, t) -> prediction
    x0: jax.Array,
    t: jax.Array,
    rng: jax.Array,
    predict: str = "x0",  # MDM predicts x0; "epsilon" also supported
) -> tuple[jax.Array, jax.Array]:
    """Per-sample MSE losses (B,) + scalar mean."""
    noise = jax.random.normal(rng, x0.shape, x0.dtype)
    x_t = q_sample(gd, x0, t, noise)
    pred = model_fn(x_t, t)
    target = x0 if predict == "x0" else noise
    per_sample = jnp.mean((pred - target) ** 2, axis=tuple(range(1, x0.ndim)))
    return per_sample, jnp.mean(per_sample)


def p_sample_loop(
    gd: GaussianDiffusion,
    model_fn: Callable,
    rng: jax.Array,
    shape: tuple[int, ...],
    predict: str = "x0",
    clip_x0: bool = False,
) -> jax.Array:
    """Ancestral DDPM sampling as one lax.scan over all T steps."""
    k_init, k_loop = jax.random.split(rng)
    x = jax.random.normal(k_init, shape, jnp.float32)
    ts = jnp.arange(gd.num_timesteps - 1, -1, -1)

    def body(carry, t):
        x, key = carry
        key, k = jax.random.split(key)
        pred = model_fn(x, jnp.broadcast_to(t, (shape[0],)))
        x0 = pred if predict == "x0" else predict_x0_from_eps(gd, x, t, pred)
        if clip_x0:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean = q_posterior_mean(gd, x0, x, t)
        logvar = gd.posterior_log_variance_clipped[t]
        noise = jax.random.normal(k, shape, jnp.float32)
        x = mean + jnp.where(t > 0, jnp.exp(0.5 * logvar), 0.0) * noise
        return (x, key), None

    (x, _), _ = jax.lax.scan(body, (x, k_loop), ts)
    return x


def respaced_timesteps(num_timesteps: int, sections: int) -> np.ndarray:
    """Evenly respaced subset (mdm_respace.space_timesteps, one 'uniform'
    section): fractional stride (size-1)/(count-1) accumulated and rounded,
    so the FINAL original timestep (T-1) is always included - sampling must
    start at the t whose marginal matches the N(0, 1) init latents
    (mdm_respace.py:41-58)."""
    if sections <= 1:
        return np.zeros(max(sections, 0), np.int64)
    frac = (num_timesteps - 1) / (sections - 1)
    return np.asarray([round(i * frac) for i in range(sections)], np.int64)


def ddim_sample_loop(
    gd: GaussianDiffusion,
    model_fn: Callable,
    rng: jax.Array,
    shape: tuple[int, ...],
    num_steps: int = 50,
    predict: str = "x0",
) -> jax.Array:
    """Respaced eta=0 DDIM over this diffusion's tables (lax.scan)."""
    ts = respaced_timesteps(gd.num_timesteps, num_steps)[::-1].copy()
    ts_prev = np.concatenate([ts[1:], [-1]])
    x = jax.random.normal(rng, shape, jnp.float32)

    def body(x, args):
        t, t_prev = args
        pred = model_fn(x, jnp.broadcast_to(t, (shape[0],)))
        if predict == "x0":
            x0 = pred
            acp_t = gd.alphas_cumprod[t]
            eps = (x - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)
        else:
            eps = pred
            x0 = predict_x0_from_eps(gd, x, t, eps)
        acp_prev = jnp.where(t_prev >= 0, gd.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0)
        x = jnp.sqrt(acp_prev) * x0 + jnp.sqrt(1.0 - acp_prev) * eps
        return x, None

    x, _ = jax.lax.scan(body, x, (jnp.asarray(ts), jnp.asarray(ts_prev)))
    return x


# --------------------------------------------------- loss-aware resampling


class LossAwareState(NamedTuple):
    """Running second moments of per-timestep losses (mdm_resample.py:23-154).

    Pure-functional: update returns a new state. Under SPMD data parallelism
    the batch statistics are already identical on every replica post-psum, so
    no explicit all_gather is needed (the reference used torch.distributed).
    """

    loss_sq_history: jax.Array  # (T, K) ring buffer of squared losses
    counts: jax.Array  # (T,)

    @classmethod
    def create(cls, num_timesteps: int, history: int = 10) -> "LossAwareState":
        return cls(jnp.zeros((num_timesteps, history)), jnp.zeros(num_timesteps, jnp.int32))


def loss_aware_weights(state: LossAwareState, uniform_prob: float = 0.001) -> jax.Array:
    """Sampling probabilities proportional to RMS loss once warm."""
    warm = jnp.all(state.counts >= state.loss_sq_history.shape[1])
    rms = jnp.sqrt(jnp.mean(state.loss_sq_history, axis=1) + 1e-12)
    p = rms / jnp.sum(rms)
    p = p * (1 - uniform_prob) + uniform_prob / p.shape[0]
    uniform = jnp.full_like(p, 1.0 / p.shape[0])
    return jnp.where(warm, p, uniform)


def loss_aware_update(state: LossAwareState, t: jax.Array, losses: jax.Array) -> LossAwareState:
    """Insert per-sample losses into the ring buffer at their timesteps."""
    def insert(state, args):
        ti, li = args
        hist, counts = state
        k = jnp.minimum(counts[ti], hist.shape[1] - 1)
        # shift-left once full, else append
        row = hist[ti]
        full = counts[ti] >= hist.shape[1]
        row = jnp.where(full, jnp.roll(row, -1).at[-1].set(li**2), row.at[k].set(li**2))
        return (hist.at[ti].set(row), counts.at[ti].add(1)), None

    (hist, counts), _ = jax.lax.scan(insert, (state.loss_sq_history, state.counts), (t, losses))
    return LossAwareState(hist, counts)


def sample_timesteps(
    rng: jax.Array, state: LossAwareState, batch: int
) -> tuple[jax.Array, jax.Array]:
    """Importance-sample timesteps -> (t, importance weights 1/(T p))."""
    p = loss_aware_weights(state)
    t = jax.random.choice(rng, p.shape[0], (batch,), p=p)
    w = 1.0 / (p.shape[0] * p[t])
    return t, w
