"""Loss functions for both training stages, pure JAX.

Stage-2 (LPDM) losses mirror LatentPriorLosses
(models/latent_diffusion/utils/latent_losses.py:101-151) in the flagship
``vae_diffusion`` / v0 / SMPL-X configuration (configs/diff_latent_v2.json:67-80
with trainer.py:176-177 runtime overrides):

  gradient-bearing:  recons_feature (SmoothL1) + LAMBDA_KL * kl_motion
                     + inst_loss (MSE on epsilon)
  monitor-only:      gen_feature (SmoothL1 vs the DDIM monitor sample),
                     rec/gen vertex displacement (SmoothL1 on SMPL-X
                     vertices) - the reference computes these under
                     torch.no_grad (trainer.py:413-415, latent_losses.py:173),
                     so they shape logs, not gradients. Reproduced with
                     lax.stop_gradient.

Stage-1 (AST) losses mirror AST_EVP._collect_metrics (AST_EVP.py:260-325):
16 x L1 reconstruction + CE on emotion/style logits + content alignment L1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1(pred: jax.Array, target: jax.Array, beta: float = 1.0) -> jax.Array:
    """torch.nn.SmoothL1Loss(reduction='mean') with default beta=1."""
    diff = jnp.abs(pred - target)
    return jnp.mean(jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta))


def mse(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean((pred - target) ** 2)


def l1(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """torch.nn.CrossEntropyLoss(reduction='mean') on int labels."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def accuracy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Top-1 accuracy in percent (AST_EVP.py:263-266 convention)."""
    return 100.0 * jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


# ------------------------------------------------------------------ stage 2

LAMBDA_KL = 1e-4  # configs/diff_latent_v2.json:75
LAMBDA_REC = 1.0
LAMBDA_GEN = 1.0


def lpdm_losses(
    m_ref: jax.Array,  # (B, T, 333) reference 6D motion
    m_rst: jax.Array,  # VAE reconstruction
    mu: jax.Array,
    logvar: jax.Array,
    noise: jax.Array,
    noise_pred: jax.Array,
    gen_m_rst: jax.Array | None = None,  # DDIM monitor decode (stop-gradiented)
    rec_vertices: tuple | None = None,  # (rst_verts, ref_verts) stop-gradiented
    gen_vertices: tuple | None = None,  # (gen_verts, ref_verts) stop-gradiented
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Total loss + per-term dict for the joint prior+denoiser step."""
    from amuse_tpu.models.vae import kl_divergence_normal

    rec = smooth_l1(m_rst, m_ref)
    kl = kl_divergence_normal(mu, logvar)
    inst = mse(noise_pred, noise)
    total = LAMBDA_REC * rec + LAMBDA_KL * kl + inst
    logs = {"recons_feature": rec, "kl_motion": kl, "inst_loss": inst}

    if gen_m_rst is not None:
        gen = smooth_l1(jax.lax.stop_gradient(gen_m_rst), m_ref)
        total = total + LAMBDA_GEN * jax.lax.stop_gradient(gen)
        logs["gen_feature"] = gen
    if rec_vertices is not None:
        v = smooth_l1(*map(jax.lax.stop_gradient, rec_vertices))
        total = total + jax.lax.stop_gradient(v)
        logs["rec_vtex_displacement"] = v
    if gen_vertices is not None:
        v = smooth_l1(*map(jax.lax.stop_gradient, gen_vertices))
        total = total + jax.lax.stop_gradient(v)
        logs["gen_vtex_displacement"] = v
    logs["total"] = total
    return total, logs


# ------------------------------------------------------------------ stage 1


def ast_swap_losses(
    recon_fbanks: jax.Array,  # (16, B, 1024, 128): [self x4 | con x4 | emo x4 | sty x4]
    clean_fbanks: jax.Array,  # (4, B, 1024, 128): targets a1t1, a1t2, a2t1, a2t2
    emo_logits: jax.Array,  # (4, B, 8)
    sty_logits: jax.Array,  # (4, B, 30)
    con_features: jax.Array,  # (4, B, 256)
    emo_id: jax.Array,  # (B,)
    a1_id: jax.Array,  # (B,) 0-based actor index
    a2_id: jax.Array,  # (B,)
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Stage-1 objective (AST_EVP.py:272-325).

    Reconstruction target layout: every one of the 4 swap groups maps its
    i-th output back to clean target i (the reference compares each dict's
    recon keys against that element's own ground-truth fbank).
    """
    targets = jnp.tile(clean_fbanks, (4, 1, 1, 1))  # (16, B, 1024, 128)
    rec = jnp.mean(jnp.abs(recon_fbanks - targets), axis=(1, 2, 3))  # per recon
    rec_total = jnp.sum(rec)  # 16 L1 terms summed, each itself a mean

    ce_emo = sum(cross_entropy(emo_logits[i], emo_id) for i in range(4))
    sty_labels = [a1_id, a1_id, a2_id, a2_id]
    ce_sty = sum(cross_entropy(sty_logits[i], sty_labels[i]) for i in range(4))

    con_align = l1(con_features[0], con_features[2]) + l1(con_features[1], con_features[3])

    total = rec_total + ce_emo + ce_sty + con_align
    emo_acc = sum(accuracy(emo_logits[i], emo_id) for i in range(4)) / 4.0
    sty_acc = sum(accuracy(sty_logits[i], sty_labels[i]) for i in range(4)) / 4.0
    logs = {
        "recon": rec_total,
        "ce_emo": ce_emo,
        "ce_sty": ce_sty,
        "con_align": con_align,
        "emo_acc": emo_acc,
        "person_id_acc": sty_acc,
        "total": total,
    }
    return total, logs
