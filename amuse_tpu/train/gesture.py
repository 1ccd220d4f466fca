"""Stage-2 training: joint motion-prior VAE + latent-diffusion denoiser (LPDM).

Re-design of trainer.train_prior_latdiff_forward_backward_v2
(scripts/trainer.py:335-498). The reference's per-step Python sequence -
axis-angle->6D, grad VAE pass, no-grad re-encode, DDPM noising + epsilon
prediction, a full *50-step DDIM sampling pass under no_grad*, 6D->3D
conversions, SMPL-X float64 vertex forward, AdamW step - composes here into
ONE jitted, data-parallel-sharded program:

  * the DDIM monitor pass is a lax.scan with stop_gradient (cheap, fused),
    and can be throttled to every K steps (``monitor_every``) since it
    carries no gradient (trainer.py:413-415 runs it every step),
  * the vertex loss runs the JAX SMPL-X LBS in float32 (the reference's
    float64 is unnecessary - see tests/test_smplx.py),
  * batch shards over the mesh "data" axis; params/optimizer replicate;
    XLA inserts the gradient psum.

Optimizer: AdamW(1e-4) over the union of prior+denoiser params
(trainer.py:180-184, configs/base_new.json lr_base).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from amuse_tpu.core import motion as motion_mod
from amuse_tpu.core import smplx as smplx_mod
from amuse_tpu.diffusion import add_noise, ddim_sample, make_schedule
from amuse_tpu.models.denoiser import Denoiser, DenoiserConfig
from amuse_tpu.models.vae import MotionPrior, PriorConfig
from amuse_tpu.train import fused_adam
from amuse_tpu.train import losses as L
from amuse_tpu.train import prng


@dataclass(frozen=True)
class GestureTrainConfig:
    learning_rate: float = 1e-4  # configs/base_new.json lr_base
    batch_size: int = 32  # configs/base_new.json:281
    epochs: int = 12_000  # configs/base_new.json:293
    num_inference_steps: int = 50
    monitor_every: int = 1  # reference runs the DDIM monitor every step
    vtex_displacement: bool = True  # configs/base_new.json vtex_displacement
    checkpoint_every: int = 200  # model_save_freq
    # motion representation the prior/diffusion stack trains on
    # (trainer.py:363-376): "6D"+trans (333 feats) or raw axis-angle "3D"
    # (168, or 165 with skip_trans - denoiser.py:24-27 asserts 3D-only).
    # PriorConfig.nfeats must be sized to match (cli/main.py::_model_cfgs).
    smplx_rep: str = "6D"
    skip_trans: bool = False


class TrainState(NamedTuple):
    params: dict  # {"prior": ..., "denoiser": ...}
    opt_state: fused_adam.FusedAdamState
    step: jax.Array


def make_optimizer(cfg: GestureTrainConfig) -> fused_adam.FusedAdam:
    # torch.optim.AdamW(lr=lr_base) with DEFAULT kwargs (trainer.py:184):
    # torch's default weight_decay is 0.01 (optax.adamw's would be 1e-4 -
    # passing it explicitly or regularization is silently 100x weaker than
    # the reference run). betas/eps defaults agree (0.9, 0.999, 1e-8).
    # One-pass fused update (train/fused_adam.py): same math as
    # optax.adamw (+apply_updates), pinned in tests/test_fused_adam.py
    # against both optax and live torch.optim.AdamW.
    return fused_adam.make_fused_adam(weight_decay=0.01, mode="decoupled")


def init_state(
    rng: jax.Array,
    prior_cfg: PriorConfig = PriorConfig(),
    denoiser_cfg: DenoiserConfig = DenoiserConfig(),
    cfg: GestureTrainConfig = GestureTrainConfig(),
) -> TrainState:
    from amuse_tpu.models.denoiser import init_denoiser_params
    from amuse_tpu.models.vae import init_prior_params

    k1, k2 = jax.random.split(rng)
    params = {
        "prior": init_prior_params(k1, prior_cfg),
        "denoiser": init_denoiser_params(k2, denoiser_cfg),
    }
    opt_state = make_optimizer(cfg).init(params, cfg.learning_rate)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def make_train_step(
    prior_cfg: PriorConfig = PriorConfig(),
    denoiser_cfg: DenoiserConfig = DenoiserConfig(),
    cfg: GestureTrainConfig = GestureTrainConfig(),
    smplx_model: Optional[smplx_mod.SmplxModel] = None,
    with_monitor: bool = True,
):
    """Build the jitted LPDM train step.

    batch dict (leading dim = windows, sharded over the data axis):
      motion (B, 300, 168) raw axis-angle+trans   [dm LMDB tuple slot 0]
      con/emo/sty (B, 256) frozen AST features    [slots 4-6]
      betas (B, 300) per-actor MoSh betas         [ld_attr -> subject betas]
    """
    prior = MotionPrior(prior_cfg)
    denoiser = Denoiser(denoiser_cfg)
    schedule = make_schedule()
    optimizer = make_optimizer(cfg)
    do_vtex = cfg.vtex_displacement and smplx_model is not None
    # slab-form model tables for the vertex monitors (host-side, once);
    # numerically equal to forward_batch (tests/test_smplx.py) but keeps
    # every device tensor 2D - see core/smplx.py::SocTables
    soc = smplx_mod.prepare_soc(smplx_model) if do_vtex else None

    rep, skip_trans = cfg.smplx_rep, cfg.skip_trans

    def to_feats6d(feats):
        """Rep feature space -> 6D+trans feats for the vertex monitors."""
        if rep == "6D":
            return feats
        aa, tr = motion_mod.defeaturize(feats, rep, skip_trans)
        flat = aa.reshape(aa.shape[:-2] + (-1,))
        return motion_mod.axis_angle_to_feats6d(jnp.concatenate([flat, tr], -1))

    def loss_fn(params, batch, rng):
        r_enc, r_enc2, r_t, r_noise, r_ddim, r_drop = jax.random.split(rng, 6)
        # dropout masks ride the TPU hardware RNG stream (train/prng.py):
        # the torch-parity attention-weight dropout alone is ~208M draws
        # per step at flagship dims, 18.5 ms of threefry on the VPU
        d1, d2, d3, d4 = jax.random.split(prng.dropout_key(r_drop), 4)
        # trainer.py:363-376: 6D+trans features, or raw axis-angle for "3D"
        m6 = motion_mod.featurize(batch["motion"], rep, skip_trans)

        # ---- VAE pass (grad; dropout active - the reference trains with
        # model.train(), trainer.py:358-360)
        z, (mu, logvar) = prior.apply(
            {"params": params["prior"]}, m6, r_enc, None, False,
            method="encode", rngs={"dropout": d1},
        )
        m_rst = prior.apply(
            {"params": params["prior"]}, z, prior_cfg.window, None, False,
            method="decode", rngs={"dropout": d2},
        )

        # ---- diffusion pass (grad to denoiser only; trainer.py:407-410)
        z_sg = jax.lax.stop_gradient(
            prior.apply(
                {"params": params["prior"]}, m6, r_enc2, None, False,
                method="encode", rngs={"dropout": d3},
            )[0]
        )
        b = m6.shape[0]
        t = jax.random.randint(r_t, (b,), 0, schedule.num_train_timesteps)
        noise = jax.random.normal(r_noise, z_sg.shape, jnp.float32)
        noisy = add_noise(schedule, z_sg, noise, t)
        noise_pred = denoiser.apply(
            {"params": params["denoiser"]}, noisy, t,
            batch["con"], batch["emo"], batch["sty"], False,
            rngs={"dropout": d4},
        )

        # ---- DDIM monitor pass (no grad; trainer.py:413-415)
        gen_m_rst = None
        rec_v = gen_v = None
        if with_monitor:
            sg_params = jax.lax.stop_gradient(params)

            # Monitor runs deterministically (dropout off): the reference
            # leaves dropout on here (models stay in .train() during the
            # no-grad sampling pass) but the monitor carries no gradient, so
            # determinism only de-noises the logged metric.
            def denoise_fn(latents, tt):
                return denoiser.apply(
                    {"params": sg_params["denoiser"]}, latents, tt,
                    batch["con"], batch["emo"], batch["sty"],
                )

            gen_z = ddim_sample(
                schedule, denoise_fn, r_ddim,
                (b, denoiser_cfg.latent_tokens, denoiser_cfg.latent_dim),
                cfg.num_inference_steps,
            )
            gen_m_rst = prior.apply(
                {"params": sg_params["prior"]}, gen_z, prior_cfg.window, method="decode"
            )
            if do_vtex:
                betas = batch["betas"]
                # slab-form LBS straight from the 6D feats (skips the
                # 6D->axis-angle->matrix round-trip; core/smplx.py SocTables
                # explains the TPU layout rationale). Each call returns a
                # (3, B*T, V) component stack; smooth_l1 treats it
                # identically to the (N, V, 3) ordering. For the "3D" rep
                # the features convert to 6D first (to_feats6d above).
                v_ref = smplx_mod.soc_monitor_vertices(
                    smplx_model, soc, to_feats6d(m6), betas
                )
                v_rst = smplx_mod.soc_monitor_vertices(
                    smplx_model, soc, to_feats6d(jax.lax.stop_gradient(m_rst)), betas
                )
                v_gen = smplx_mod.soc_monitor_vertices(
                    smplx_model, soc, to_feats6d(gen_m_rst), betas
                )
                rec_v = (v_rst, v_ref)
                gen_v = (v_gen, v_ref)

        return L.lpdm_losses(
            m6, m_rst, mu, logvar, noise, noise_pred, gen_m_rst, rec_v, gen_v
        )

    @jax.jit
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        params, opt_state = optimizer.apply(state.opt_state, state.params, grads)
        return TrainState(params, opt_state, state.step + 1), logs

    return train_step
