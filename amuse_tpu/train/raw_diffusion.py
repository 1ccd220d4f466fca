"""Training step for the legacy raw-pose diffusion baseline ("diffusion" tag).

Completes the model family re-provided from models/diffusion/ (reference
trainer path for PoseMDM-style baselines): x0-prediction MSE with
importance-sampled timesteps (the loss-aware resampler the reference vendored
from OpenAI, mdm_resample.py), AdamW, one jitted step, data-parallel like
the flagship steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from amuse_tpu.diffusion import gaussian as G
from amuse_tpu.train import prng
from amuse_tpu.models.raw_diffusion import RawDenoiserConfig, RawPoseDenoiser


@dataclass(frozen=True)
class RawTrainConfig:
    learning_rate: float = 1e-4
    num_timesteps: int = 1000
    schedule: str = "cosine"  # MDM default
    predict: str = "x0"  # MDM predicts x0
    loss_aware: bool = True


class RawTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    sampler_state: G.LossAwareState
    step: jax.Array


def init_state(
    rng: jax.Array,
    model_cfg: RawDenoiserConfig = RawDenoiserConfig(),
    cfg: RawTrainConfig = RawTrainConfig(),
) -> RawTrainState:
    model = RawPoseDenoiser(model_cfg)
    # jitted init like every other model in the repo: eager flax init is
    # per-primitive dispatch - pathological through a remote-compile tunnel
    params = jax.jit(model.init)(
        rng,
        jnp.zeros((1, model_cfg.window, model_cfg.nfeats)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, model_cfg.cond_dim)),
        jnp.zeros((1, model_cfg.cond_dim)),
    )["params"]
    opt_state = optax.adamw(cfg.learning_rate).init(params)
    return RawTrainState(
        params, opt_state, G.LossAwareState.create(cfg.num_timesteps),
        jnp.zeros((), jnp.int32),
    )


def make_train_step(
    model_cfg: RawDenoiserConfig = RawDenoiserConfig(),
    cfg: RawTrainConfig = RawTrainConfig(),
):
    """batch: {"motion" (B, T, nfeats), "con" (B, C), "emo" (B, C)}."""
    model = RawPoseDenoiser(model_cfg)
    betas = G.cosine_betas(cfg.num_timesteps) if cfg.schedule == "cosine" else G.linear_betas(cfg.num_timesteps)
    gd = G.make_gaussian_diffusion(betas)
    optimizer = optax.adamw(cfg.learning_rate)

    def loss_fn(params, batch, t, weights, rng):
        def model_fn(x_t, tt):
            return model.apply(
                {"params": params}, x_t, tt, batch["con"], batch["emo"], False,
                rngs={"dropout": prng.dropout_key(jax.random.fold_in(rng, 1))},
            )

        per_sample, _ = G.training_loss(gd, model_fn, batch["motion"], t, rng, cfg.predict)
        return jnp.mean(per_sample * weights), per_sample

    @jax.jit
    def train_step(state: RawTrainState, batch: dict, rng: jax.Array):
        r_t, r_loss = jax.random.split(rng)
        b = batch["motion"].shape[0]
        if cfg.loss_aware:
            t, weights = G.sample_timesteps(r_t, state.sampler_state, b)
        else:
            t = jax.random.randint(r_t, (b,), 0, cfg.num_timesteps)
            weights = jnp.ones((b,))
        (loss, per_sample), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, t, weights, r_loss
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        sampler_state = (
            G.loss_aware_update(state.sampler_state, t, per_sample)
            if cfg.loss_aware
            else state.sampler_state
        )
        logs = {"loss": loss, "loss_unweighted": jnp.mean(per_sample)}
        return RawTrainState(params, opt_state, sampler_state, state.step + 1), logs

    def sample_fn(params, rng, batch_cond, num_frames=None):
        """Ancestral sampling with the trained model (p_sample_loop)."""
        frames = num_frames or model_cfg.window
        b = batch_cond["con"].shape[0]

        def model_fn(x_t, tt):
            return model.apply(
                {"params": params}, x_t, tt, batch_cond["con"], batch_cond["emo"]
            )

        return G.p_sample_loop(gd, model_fn, rng, (b, frames, model_cfg.nfeats), cfg.predict)

    return train_step, sample_fn
