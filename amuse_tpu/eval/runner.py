"""Quantitative evaluation runner: FGD / diversity / APE / AVE / beat align.

Drives the real metric implementations (amuse_tpu.eval.metrics) over a
stage-2 window cache + a GesturePipeline: encodes ground-truth windows into
the prior's latent feature space, generates motion for the same audio
conditioning, and reports the distributional + per-joint numbers the
reference only published in its paper (its in-repo metric module was dead
code, SURVEY §2.1).

Metric spaces:
  * APE / AVE / beat alignment run on SMPL-X **joint positions** from the
    JAX FK (core/smplx.py) when a body model is supplied - the reference
    semantics (MLD's position-space metrics, latent_losses.py vertex/joint
    space). Without a body model they fall back to axis-angle rotations and
    the report is labelled ``metric_space: "rotation"``.
  * ``fgd`` uses the motion prior's own latent space (self-referential -
    fine for tracking training, kept for continuity and labelled as such).
  * ``fgd_embedder`` uses an EXTERNAL motion embedder (eval/embedder.py)
    trained separately on ground-truth windows only - the paper-comparable
    construction. Its provenance string is included in the report so a
    synthetic-regime embedder can never pass for a BEAT-regime one.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.core import motion as motion_mod
from amuse_tpu.core import smplx as smplx_mod
from amuse_tpu.eval import metrics as M


def make_fk(smplx_model):
    """Jitted (B, T, 55, 3) aa + (B, T, 3) + (B, nb) -> (B, T, J, 3) joints.

    The model is closed over (its ``parents`` table drives static control
    flow and must not be traced), matching make_train_step's pattern.
    """

    @jax.jit
    def fk(poses_aa, trans, betas):
        b, t = poses_aa.shape[:2]
        # slice to the rig's joint count (full SMPL-X = 55; unit-test rigs
        # are smaller) - same guard as train/gesture.py::vertices
        nj = smplx_model.num_joints
        poses = poses_aa.reshape(b, t, -1, 3)[:, :, :nj].reshape(b * t, nj * 3)
        transl = trans.reshape(b * t, 3)
        nb = min(betas.shape[-1], smplx_model.shapedirs.shape[-1])
        bet = jnp.repeat(betas[:, :nb], t, axis=0)
        out = smplx_mod.forward_batch(
            smplx_model, poses, bet, transl, return_vertices=False
        )
        return out["joints"].reshape(b, t, -1, 3)

    return fk


def evaluate_cache(
    pipe,
    cache,
    max_windows: int = 256,
    batch_size: int = 32,
    seed: int = 0,
    smplx_model=None,
    embedder=None,  # (params, EmbedderConfig, provenance str) from eval.embedder.load
) -> dict[str, float]:
    """-> {fgd, fgd_embedder, diversity_real, diversity_gen, ape, ave, ...}."""
    n = min(len(cache), max_windows)
    if n == 0:
        return {"num_windows": 0.0, "error": "empty window cache"}
    # smaller caches than one batch must still evaluate (smoke-test trees)
    batch_size = max(1, min(batch_size, n))
    real_feats, gen_feats, cond_feats = [], [], []
    real_emb, gen_emb = [], []
    ape_vals, ave_vals, beat_scores, beat_scores_real = [], [], [], []
    fk = make_fk(smplx_model) if smplx_model is not None else None
    emb_fn = None
    if embedder is not None:
        from amuse_tpu.eval import embedder as emb_mod

        eparams, ecfg, _ = embedder
        # jit once outside the batch loop: the conv stack would otherwise
        # dispatch op-by-op twice per batch (the slowest leg of the eval)
        emb_fn = jax.jit(lambda m: emb_mod.embed(eparams, ecfg, m))

    for start in range(0, n, batch_size):
        # include the tail as a smaller final batch (one extra compile):
        # dropping it silently excluded up to batch_size-1 windows from
        # every metric while num_windows claimed they were covered
        items = [cache[i] for i in range(start, min(start + batch_size, n))]
        motion = jnp.asarray(np.stack([it["motion"] for it in items]))
        con = jnp.asarray(np.stack([it["con"] for it in items]))
        emo = jnp.asarray(np.stack([it["emo"] for it in items]))
        sty = jnp.asarray(np.stack([it["sty"] for it in items]))

        # metrics/embedder always work in 6D+trans space; the prior encode
        # input is whatever rep the pipeline was trained on (motion_feats)
        m6 = motion_mod.axis_angle_to_feats6d(motion)
        # disjoint PRNG streams per batch AND per role: reusing one key for
        # encode eps and the DDIM init latents makes them bit-identical
        # (same shape/dtype), correlating the real and generated feature
        # sets that FGD compares
        k_gen = jax.random.fold_in(jax.random.fold_in(jax.random.key(seed), 1), start)
        # posterior MEAN, not a reparameterised sample: a sampled z inflates
        # the real-side covariance with encoder noise, so even a perfect
        # generator would score nonzero FGD (metrics.py pins mu as the
        # canonical embedding)
        z_real = pipe.encode_motion_mu(pipe.motion_feats(motion))  # (B, 1, 128)
        real_feats.append(np.asarray(z_real[:, 0]))
        cond_feats.append(np.concatenate(
            [np.asarray(con), np.asarray(emo), np.asarray(sty)], axis=-1
        ))

        latents = pipe.generate_latents(k_gen, con, emo, sty)
        gen_feats.append(np.asarray(latents[:, 0]))

        gen_aa, gen_tr = pipe.decode_motion(latents)
        ref_aa, ref_tr = motion_mod.feats6d_to_axis_angle(m6)
        if emb_fn is not None:
            from amuse_tpu.core.rotations import axis_angle_to_rotation_6d

            g6 = axis_angle_to_rotation_6d(gen_aa).reshape(
                gen_aa.shape[0], gen_aa.shape[1], -1
            )
            gen_m6 = jnp.concatenate([g6, gen_tr], axis=-1)
            real_emb.append(np.asarray(emb_fn(m6)))
            gen_emb.append(np.asarray(emb_fn(gen_m6)))
        if smplx_model is not None:
            from amuse_tpu.data.cache import betas_for_actor_ids

            betas = jnp.asarray(
                betas_for_actor_ids(np.stack([it["actor_id"] for it in items]))
            )[:, : smplx_model.shapedirs.shape[-1]]
            ref_sig = fk(ref_aa, ref_tr, betas)
            gen_sig = fk(gen_aa, gen_tr, betas)
        else:
            ref_sig, gen_sig = ref_aa, gen_aa
        ape_vals.append(float(M.ape(ref_sig, gen_sig)))
        ave_vals.append(float(M.ave(ref_sig, gen_sig)))

        for bi in range(motion.shape[0]):
            if "audio" in items[bi]:
                ab = M.audio_beats_from_waveform(items[bi]["audio"])
                mb = M.motion_beats_from_joints(np.asarray(gen_sig[bi]))
                beat_scores.append(M.beat_alignment(mb, ab))
                # ground-truth calibration: beat_align_gen is only
                # interpretable next to what REAL motion scores on the same
                # audio with the same detectors (round-3 verdict, weak #3)
                mb_real = M.motion_beats_from_joints(np.asarray(ref_sig[bi]))
                beat_scores_real.append(M.beat_alignment(mb_real, ab))

    real = jnp.asarray(np.concatenate(real_feats))
    gen = jnp.asarray(np.concatenate(gen_feats))
    out = {
        "fgd": float(M.fgd(real, gen)),
        "diversity_real": float(M.diversity(real, seed=seed)),
        "diversity_gen": float(M.diversity(gen, seed=seed)),
        "ape": float(np.mean(ape_vals)),
        "ave": float(np.mean(ave_vals)),
        "num_windows": float(real.shape[0]),
        "metric_space": "position" if smplx_model is not None else "rotation",
    }
    if beat_scores:
        out["beat_align_gen"] = float(np.mean(beat_scores))
        out["beat_align_real"] = float(np.mean(beat_scores_real))
    if embedder is not None and real_emb:
        er = jnp.asarray(np.concatenate(real_emb))
        eg = jnp.asarray(np.concatenate(gen_emb))
        out["fgd_embedder"] = float(M.fgd(er, eg))
        out["fgd_embedder_provenance"] = embedder[2]

    # TM2T-family retrieval metrics (reference val_metrics.py:277-316,
    # dead upstream). Joint space: a closed-form linear probe from the
    # audio conditioning (con|emo|sty, 3x256) onto the prior latent space,
    # fit on the GROUND-TRUTH pairs of this same eval set - so
    # *_real is an in-sample calibration ceiling and *_gen measures
    # whether generated motion is as audio-identifiable as real motion
    # under the identical probe. r_size follows upstream (32) when enough
    # windows exist, else shrinks to n (labelled).
    n_pairs = int(real.shape[0])
    if n_pairs >= 8:
        conds = jnp.asarray(np.concatenate(cond_feats))
        # out-of-fold predictions: with N < D an in-sample probe
        # near-interpolates and *_real pins at ~1.0 carrying no calibration
        # information; cross-fitting keeps every row unseen by its probe
        cond_emb = M.cross_fit_linear_probe(conds, real, seed=seed)
        r_size = min(32, n_pairs)
        for tag, feats in (("real", real), ("gen", gen)):
            suite = M.r_precision_suite(cond_emb, feats, r_size=r_size, seed=seed)
            out[f"matching_score_{tag}"] = suite["matching_score"]
            for k in (1, 2, 3):
                out[f"r_precision_top_{k}_{tag}"] = suite[f"r_precision_top_{k}"]
        out["r_precision_r_size"] = float(r_size)
        out["r_precision_probe"] = (
            "linear ridge, audio(768)->prior latent(128), 4-fold cross-fit "
            "on these GT pairs (out-of-fold predictions)"
        )
    return out
