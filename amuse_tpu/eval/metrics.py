"""Quantitative gesture metrics: FGD, beat alignment, diversity, APE/AVE.

The reference ships these only as dead code copied from MLD
(models/latent_diffusion/utils/val_metrics.py - imported nowhere, references
undefined symbols; SURVEY §2.1) and ran its numbers out-of-repo. This module
makes them real, in JAX, batched:

  * FGD (Frechet Gesture Distance): Frechet distance between Gaussians fit
    to feature embeddings of real vs generated motion. The canonical
    embedding here is the motion prior's posterior mean (mu), giving a
    self-contained FGD without an external classifier; any (N, D) feature
    matrix works.
  * Beat alignment (Li et al. 2021 style): mean over motion beats of
    exp(-min_dist_to_audio_beat^2 / 2 sigma^2), with motion beats = local
    minima of joint speed and audio beats = spectral-flux onset peaks.
  * Diversity: mean pairwise L2 between feature embeddings of random pairs.
  * APE / AVE: average position error / variance error per joint against
    ground truth (the MLD-style recon metrics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------------ FGD


def gaussian_frechet_distance(
    mu1: jax.Array, cov1: jax.Array, mu2: jax.Array, cov2: jax.Array
) -> jax.Array:
    """FD^2 = |mu1-mu2|^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2}).

    The matrix sqrt uses an eigendecomposition of the symmetrised product -
    stable for the PSD covariances that arise here, and differentiable.
    """
    diff = jnp.sum((mu1 - mu2) ** 2)
    # sqrt(C1 C2) via C1^{1/2} C2 C1^{1/2} (symmetric PSD, same eigenvalues)
    e1, v1 = jnp.linalg.eigh(cov1)
    sqrt_c1 = (v1 * jnp.sqrt(jnp.maximum(e1, 0.0))) @ v1.T
    inner = sqrt_c1 @ cov2 @ sqrt_c1
    ei = jnp.linalg.eigvalsh(inner)
    tr_sqrt = jnp.sum(jnp.sqrt(jnp.maximum(ei, 0.0)))
    return diff + jnp.trace(cov1) + jnp.trace(cov2) - 2.0 * tr_sqrt


def _fit_gaussian(feats: jax.Array) -> tuple[jax.Array, jax.Array]:
    mu = jnp.mean(feats, axis=0)
    x = feats - mu
    # n=1: zero covariance (0/0 would be NaN); FGD degenerates to the mean
    # distance, which is the honest answer for a single sample
    cov = (x.T @ x) / max(feats.shape[0] - 1, 1)
    return mu, cov


def fgd(real_feats: jax.Array, gen_feats: jax.Array) -> jax.Array:
    """Frechet distance between (N, D) real and (M, D) generated features."""
    mu_r, cov_r = _fit_gaussian(real_feats)
    mu_g, cov_g = _fit_gaussian(gen_feats)
    return gaussian_frechet_distance(mu_r, cov_r, mu_g, cov_g)


# --------------------------------------------------------- beat alignment


def audio_beats_from_waveform(
    waveform: np.ndarray, sr: int = 16_000, fps: float = 30.0
) -> np.ndarray:
    """Onset times (seconds) from spectral flux peaks of the mel fbank."""
    import jax.numpy as jnp  # local: host-side helper, small input

    from amuse_tpu.audio import fbank as fb

    wave = np.asarray(waveform, np.float32)
    if wave.ndim == 2:
        wave = wave[0]
    mel = np.asarray(fb.fbank(jnp.asarray(wave)))  # (T, 128), 100 fps
    flux = np.maximum(np.diff(np.exp(mel), axis=0), 0).sum(axis=1)
    if flux.size == 0:
        return np.zeros(0)
    flux = (flux - flux.mean()) / (flux.std() + 1e-8)
    thresh = 0.5
    peaks = []
    for i in range(1, len(flux) - 1):
        if flux[i] > thresh and flux[i] >= flux[i - 1] and flux[i] >= flux[i + 1]:
            peaks.append(i)
    return np.asarray(peaks) * 0.01  # 10 ms fbank hop


def motion_beats_from_joints(joints: np.ndarray, fps: float = 30.0) -> np.ndarray:
    """Beat times (seconds) = local minima of mean joint speed.

    joints: (T, J, 3) positions (from the SMPL-X FK) or (T, J, 3) axis-angle
    velocities proxy - any per-frame pose signal works.
    """
    j = np.asarray(joints)
    vel = np.linalg.norm(np.diff(j.reshape(j.shape[0], -1), axis=0), axis=1)
    beats = []
    for i in range(1, len(vel) - 1):
        if vel[i] < vel[i - 1] and vel[i] <= vel[i + 1]:
            beats.append(i + 1)
    return np.asarray(beats) / fps


def beat_alignment(
    motion_beats: np.ndarray, audio_beats: np.ndarray, sigma: float = 0.1
) -> float:
    """BeatAlign score: mean_m exp(-min_a (t_m - t_a)^2 / (2 sigma^2))."""
    if len(motion_beats) == 0 or len(audio_beats) == 0:
        return 0.0
    d = motion_beats[:, None] - audio_beats[None, :]
    min_d2 = np.min(d * d, axis=1)
    return float(np.mean(np.exp(-min_d2 / (2.0 * sigma * sigma))))


# --------------------------------------------------------------- diversity


def diversity(feats: jax.Array, num_pairs: int = 200, seed: int = 0) -> jax.Array:
    """Mean L2 between random DISTINCT pairs of (N, D) features (TM2T
    convention). j is drawn as a nonzero offset from i, so i == j (a
    guaranteed zero distance that biases the mean down ~num_pairs/N %)
    cannot occur."""
    n = feats.shape[0]
    if n < 2:
        return jnp.zeros(())
    k1, k2 = jax.random.split(jax.random.key(seed))
    i = jax.random.randint(k1, (num_pairs,), 0, n)
    j = (i + jax.random.randint(k2, (num_pairs,), 1, n)) % n
    return jnp.mean(jnp.linalg.norm(feats[i] - feats[j], axis=-1))


# ---------------------------------------------------------------- APE/AVE


def ape(gt: jax.Array, pred: jax.Array) -> jax.Array:
    """Average Position Error: mean_t,j |gt - pred| L2 per joint, averaged.

    gt/pred: (..., T, J, 3) joint positions.
    """
    return jnp.mean(jnp.linalg.norm(gt - pred, axis=-1))


def ave(gt: jax.Array, pred: jax.Array) -> jax.Array:
    """Average Variance Error: | var_t(gt) - var_t(pred) | averaged."""
    var_gt = jnp.var(gt, axis=-3)
    var_pred = jnp.var(pred, axis=-3)
    return jnp.mean(jnp.abs(var_gt - var_pred))
