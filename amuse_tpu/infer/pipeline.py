"""Gesture generation pipeline: WAV -> SMPL-X animation, one jitted program.

Re-design of the reference inference stack
(models/latent_diffusion/infer_ldm.py:130-193, scripts/trainer.py:500-543):

  reference (per 10 s window, Python-loop on GPU):
     kaldi fbank -> 3 AST forwards -> 50 sequential denoiser calls ->
     VAE decode -> pytorch3d 6D->aa
  here (all windows batched, ONE XLA program on TPU):
     fbank (jit) -> AST triple encode (bf16 MXU) -> lax.scan DDIM(50) ->
     VAE decode -> 6D->aa  -- fused end-to-end, zero host round-trips.

Parameters are traced arguments (donated-friendly), never baked into the
executable. The driver-visible north star is ``wav_to_motion``: 10 s WAV ->
SMPL-X poses in < 1 s on one chip (BASELINE.md).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.audio import fbank as fbank_mod
from amuse_tpu.core import motion as motion_mod
from amuse_tpu.diffusion import ddim_sample, make_schedule
from amuse_tpu.models.ast import ASTConfig, ASTDisentangler
from amuse_tpu.models.denoiser import Denoiser, DenoiserConfig
from amuse_tpu.models.vae import MotionPrior, PriorConfig


class PipelineParams(NamedTuple):
    """Frozen parameter trees of the three models."""

    ast: dict
    prior: dict
    denoiser: dict


class GesturePipeline:
    """Frozen-weights inference engine (the reference's PretrainedLPDM_v1).

    Each public method wraps one jitted pure function of (params, inputs);
    repeated calls with the same window count hit the compile cache. The
    batch dim is the number of 10 s windows.
    """

    def __init__(
        self,
        params: PipelineParams,
        prior_cfg: PriorConfig = PriorConfig(),
        denoiser_cfg: DenoiserConfig = DenoiserConfig(),
        ast_cfg: ASTConfig = ASTConfig(),
        dtype=jnp.bfloat16,
        num_inference_steps: int = 50,
        frame_based_feats: bool = True,  # MUST match the stage-1 training
        # knob (cfg.audio.frame_based_feats): the feature head is trained on
        # either mean-pooled patch tokens (True) or the cls/dist average
        # (False) - feeding it the other distribution silently degrades
        # every downstream generation.
        smplx_rep: str = "6D",  # motion rep the prior was trained on
        skip_trans: bool = False,  # (trainer.py:363-376; must match training)
    ):
        import dataclasses

        self.prior_cfg = prior_cfg
        self.denoiser_cfg = denoiser_cfg
        self.ast_cfg = ast_cfg
        self.smplx_rep = smplx_rep
        self.skip_trans = skip_trans
        # Inference only needs the 256-d features (no label heads), and the
        # three encoders' backbones are shape-identical: stack their param
        # trees and vmap ONE encoder over them - 3 sequential ViT-base
        # forwards become one (3 x N)-batched forward on the MXU.
        from amuse_tpu.models.ast import ASTEncoder

        # fused_attention dispatches per-backend (Pallas on TPU, XLA on CPU)
        feat_cfg = dataclasses.replace(
            ast_cfg, label_dim=0, dtype=dtype, fused_attention=True
        )
        feat_encoder = ASTEncoder(feat_cfg)

        def stacked_backbone(ast_params):
            """Stack {emo, sty, con} encoder backbones along a leading axis."""
            def strip(tree):
                drop = {"featbased_ln", "featbased_fc", "mlp_ln", "mlp_fc"}
                return {k: v for k, v in tree.items() if k not in drop}

            trees = [strip(ast_params[k]) for k in ("con", "emo", "sty")]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)

        # Stack ONCE at construction (one jitted program, executed once):
        # stacking inside the jitted encode re-copied ~3 ViT-base trees
        # through HBM on every call. This also drops the stage-1 fusion/
        # decoder/ablation trees (~134M params the encode path never reads)
        # from device memory - self.params.ast holds only the stacked,
        # stripped backbones.
        ast_tree = params.ast
        if {"emo_enc", "sty_enc", "con_enc"} <= set(ast_tree):
            ast_tree = {
                "con": ast_tree["con_enc"],
                "emo": ast_tree["emo_enc"],
                "sty": ast_tree["sty_enc"],
            }
        ast_tree = {k: ast_tree[k] for k in ("con", "emo", "sty")}
        self.params = PipelineParams(
            ast=jax.jit(stacked_backbone)(ast_tree),
            prior=params.prior,
            denoiser=params.denoiser,
        )

        prior = MotionPrior(prior_cfg)
        denoiser = Denoiser(denoiser_cfg)
        schedule = make_schedule()

        def encode_audio(params: PipelineParams, chunks: jax.Array):
            """(N, 160000) chunks -> {con, emo, sty} (N, 256) features.

            = reference ``process_single_seq`` (infer_ldm.py:180-193) with
            the Kaldi fbank fused in. ``params.ast`` is the pre-stacked
            backbone tree built in __init__.
            """
            fb = fbank_mod.wav_chunk_to_fbank(chunks)
            feats = jax.vmap(
                lambda p: feat_encoder.apply(
                    {"params": p}, fb, frame_based_feats, True
                )["feature"],
                in_axes=0,
            )(params.ast)  # (3, N, 256) in {con, emo, sty} order
            return {"con": feats[0], "emo": feats[1], "sty": feats[2]}

        def generate_latents(
            params: PipelineParams,
            rng: jax.Array,
            con: jax.Array,
            emo: Optional[jax.Array],
            sty: Optional[jax.Array],
            initial_latents: Optional[jax.Array] = None,
        ) -> jax.Array:
            """50-step DDIM -> motion latents (N, 1, 128).

            = reference ``diffusion_backward`` (infer_ldm.py:130-161) as a
            single lax.scan. ``initial_latents`` substitutes the N(0,1) init
            for strict A/B against a recorded torch run.
            """

            def denoise_fn(latents, t):
                return denoiser.apply(
                    {"params": params.denoiser}, latents, t, con, emo, sty
                )

            shape = (con.shape[0], denoiser_cfg.latent_tokens, denoiser_cfg.latent_dim)
            return ddim_sample(
                schedule, denoise_fn, rng, shape, num_inference_steps,
                initial_latents=initial_latents,
            )

        def decode_motion(params: PipelineParams, latents: jax.Array):
            """latents -> (poses (N, 300, 55, 3) axis-angle, trans (N, 300, 3)).

            Rep-aware: a "3D"-trained prior decodes straight to axis-angle
            (zero translation under skip_trans - see motion.defeaturize)."""
            feats = prior.apply(
                {"params": params.prior}, latents, prior_cfg.window, method="decode"
            )
            return motion_mod.defeaturize(feats, smplx_rep, skip_trans)

        def encode_motion(params: PipelineParams, rng: jax.Array, feats: jax.Array):
            """Rep-space windows (N, 300, nfeats) -> latents (editing inputs);
            build the features with :meth:`motion_feats`."""
            z, _ = prior.apply({"params": params.prior}, feats, rng, method="encode")
            return z

        def encode_motion_mu(params: PipelineParams, feats: jax.Array):
            """Posterior MEAN latents (no reparameterisation noise) - the
            canonical FGD embedding (eval/metrics.py)."""
            _, (mu, _) = prior.apply(
                {"params": params.prior}, feats, jax.random.key(0), method="encode"
            )
            return mu

        def wav_to_motion(params: PipelineParams, rng: jax.Array, chunks: jax.Array):
            """The full fused program - the <1 s/chip benchmark target."""
            cond = encode_audio(params, chunks)
            latents = generate_latents(params, rng, cond["con"], cond["emo"], cond["sty"])
            return decode_motion(params, latents)

        self._encode_audio = jax.jit(encode_audio)
        # raw (unjitted) closure for callers that wrap the encode in
        # shard_map (prepare_data's mesh-sharded frozen-AST pass: the Pallas
        # attention inside has no GSPMD partitioning rule, but under
        # shard_map it sees per-device local shapes and needs none)
        self.encode_audio_fn = encode_audio
        self._generate_latents = jax.jit(generate_latents)
        self._decode_motion = jax.jit(decode_motion)
        self._encode_motion = jax.jit(encode_motion)
        self._encode_motion_mu = jax.jit(encode_motion_mu)
        self._wav_to_motion = jax.jit(wav_to_motion)

    # ------------------------------------------------------------- wrappers
    def encode_audio(self, chunks):
        return self._encode_audio(self.params, chunks)

    def generate_latents(self, rng, con, emo=None, sty=None, initial_latents=None):
        return self._generate_latents(self.params, rng, con, emo, sty, initial_latents)

    def decode_motion(self, latents):
        return self._decode_motion(self.params, latents)

    def encode_motion(self, rng, feats):
        return self._encode_motion(self.params, rng, feats)

    def encode_motion_mu(self, feats):
        return self._encode_motion_mu(self.params, feats)

    def motion_feats(self, motion):
        """Raw (..., T, 168) axis-angle+trans windows -> the feature space
        this pipeline's prior was trained on (editing/eval encode inputs)."""
        return motion_mod.featurize(motion, self.smplx_rep, self.skip_trans)

    def wav_to_motion(self, rng, chunks):
        return self._wav_to_motion(self.params, rng, chunks)

    # ----------------------------------------------------------- host-level
    def infer_wav(self, waveform: np.ndarray, seed: int = 0):
        """Host entry: full-length waveform -> dict of numpy animation data.

        Mirrors trainer._infer_prior_latdiff_from_audio_v1 (trainer.py:500-543):
        chunk to 10 s windows, run the fused program, zero the jaw for export
        (visualizer.py:196).
        """
        chunks = fbank_mod.window_waveform(waveform)
        poses, trans = self.wav_to_motion(jax.random.key(seed), jnp.asarray(chunks))
        poses = motion_mod.zero_jaw(poses)
        return {
            "poses": np.asarray(poses),  # (n_windows, 300, 55, 3)
            "trans": np.asarray(trans),  # (n_windows, 300, 3)
            "fps": 30.0,
        }


def init_random_params(
    seed: int = 0,
    prior_cfg: PriorConfig = PriorConfig(),
    denoiser_cfg: DenoiserConfig = DenoiserConfig(),
    ast_cfg: ASTConfig = ASTConfig(),
    dtype=jnp.bfloat16,
) -> PipelineParams:
    """Random-weight pipeline params (benchmarks, smoke tests, init).

    Each init is JITted: flax ``init`` is otherwise EAGER, dispatching every
    primitive individually - through a remote-compile TPU tunnel that turns
    into hundreds of per-op compile round-trips (observed: >20 min of stall
    in prepare_data). One jitted program per model keeps it to 3 compiles.
    """
    from amuse_tpu.models.denoiser import init_denoiser_params
    from amuse_tpu.models.vae import init_prior_params

    k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
    ast = ASTDisentangler(dtype=dtype, base_cfg=ast_cfg)
    ast_params = jax.jit(ast.init)(
        k1, jnp.zeros((1, ast_cfg.input_tdim, ast_cfg.input_fdim))
    )["params"]
    return PipelineParams(
        ast=ast_params,
        prior=init_prior_params(k2, prior_cfg),
        denoiser=init_denoiser_params(k3, denoiser_cfg),
    )
