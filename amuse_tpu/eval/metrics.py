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
#
# Both detectors follow published constructions (the round-3 verdict's ask),
# each pinned against a third-party reconstruction oracle in
# tests/thirdparty/librosa_onset.py + tests/test_eval_metrics.py, the same
# discipline as the fbank/scheduler oracles:
#   * audio: librosa's onset pipeline (onset_strength spectral flux on the
#     dB mel spectrogram -> util.peak_pick with onset_detect's documented
#     30 ms / 100 ms / delta=0.07 defaults), re-expressed on our Kaldi
#     front-end's fixed 10 ms hop.
#   * motion: Li et al. 2021 (AI Choreographer / AIST++) kinematic beats -
#     strict local minima of the summed per-joint speed envelope within a
#     +-order window (their argrelextrema(envelope, np.less, order=10) at
#     60 fps, scaled to the clip's fps here).

_DB_PER_NAT = 10.0 / np.log(10.0)  # ln(power) -> decibels


def onset_envelope(log_mel: np.ndarray) -> np.ndarray:
    """librosa.onset.onset_strength on a natural-log mel spectrogram.

    (T, n_mels) ln-power mel (our Kaldi fbank's output space) -> (T-1,)
    envelope: mean over bands of the positively-rectified first difference
    of the dB-scaled spectrogram (lag=1, aggregate=np.mean — librosa's
    defaults). No centering shift: our snip-edges framing already indexes
    frame t at t*hop (librosa's ``center`` compensates its own padded STFT).
    """
    s_db = np.asarray(log_mel, np.float64) * _DB_PER_NAT
    return np.maximum(np.diff(s_db, axis=0), 0.0).mean(axis=1)


def pick_peaks(
    x: np.ndarray,
    pre_max: int = 3,
    post_max: int = 1,
    pre_avg: int = 10,
    post_avg: int = 11,
    delta: float = 0.07,
    wait: int = 3,
) -> np.ndarray:
    """librosa.util.peak_pick: i is a peak iff x[i] is the max of
    x[i-pre_max : i+post_max], at least delta above the mean of
    x[i-pre_avg : i+post_avg], and > wait samples after the previous peak.

    Defaults are librosa.onset.onset_detect's documented 30 ms max-window /
    100 ms mean-window / delta=0.07 dB / 30 ms wait, scaled to the 10 ms
    fbank hop (librosa: pre_max=0.03*sr//hop etc.). Pure numpy; pinned
    against the scipy-filter reconstruction of librosa's implementation in
    tests/thirdparty/librosa_onset.py.
    """
    x = np.asarray(x, np.float64)
    n = x.size
    if n == 0:
        return np.zeros(0, np.int64)
    peaks = []
    last = -np.inf
    for i in range(n):
        # librosa computes the window max with mode="constant" (cval=0.0)
        # and the window mean with mode="nearest" edge replication
        w = x[max(i - pre_max, 0) : min(i + post_max, n)]
        mov_max = w.max() if w.size else 0.0
        if w.size < pre_max + post_max:  # ran off an edge: 0-padding joins
            mov_max = max(mov_max, 0.0)
        idx = np.clip(np.arange(i - pre_avg, i + post_avg), 0, n - 1)
        mov_avg = x[idx].mean()
        if x[i] == mov_max and x[i] >= mov_avg + delta and i > last + wait:
            peaks.append(i)
            last = i
    return np.asarray(peaks, np.int64)


def audio_beats_from_waveform(
    waveform: np.ndarray, sr: int = 16_000, fps: float = 30.0
) -> np.ndarray:
    """Onset times (seconds): librosa-construction onsets on the Kaldi mel.

    envelope[k] compares fbank frames k+1 and k, and librosa reports the
    onset at the envelope index, i.e. the frame BEFORE the energy rise
    lands; times are (k+1) * hop so the beat sits on the risen frame.
    """
    import jax.numpy as jnp  # local: host-side helper, small input

    from amuse_tpu.audio import fbank as fb

    wave = np.asarray(waveform, np.float32)
    if wave.ndim == 2:
        wave = wave[0]
    mel = np.asarray(fb.fbank(jnp.asarray(wave)))  # (T, 128) ln-power, 100 fps
    env = onset_envelope(mel)
    if env.size == 0:
        return np.zeros(0)
    return (pick_peaks(env) + 1) * 0.01  # 10 ms fbank hop


def motion_beats_from_joints(joints: np.ndarray, fps: float = 30.0) -> np.ndarray:
    """Kinematic beat times (seconds), Li et al. 2021 (AIST++) construction.

    joints: (T, J, 3) positions (from the SMPL-X FK). Envelope = sum over
    joints of the per-frame velocity norm; beats = strict local minima
    within a +-order window (scipy.signal.argrelextrema(env, np.less,
    order=10) in their code at 60 fps — order scales with fps here, min 1).
    Velocity at frame t is joints[t] - joints[t-1], so a minimum at
    envelope index i is the motion pause at frame i+1.
    """
    j = np.asarray(joints, np.float64)
    if j.shape[0] < 3:
        return np.zeros(0)
    vel = np.linalg.norm(np.diff(j, axis=0), axis=-1)  # (T-1, J)
    env = vel.sum(axis=-1) if vel.ndim == 2 else vel
    order = max(1, round(10.0 * fps / 60.0))
    n = env.size
    # argrelextrema(np.less, mode="clip") semantics: strictly smaller than
    # every +-shift neighbor for shift 1..order, with out-of-range neighbor
    # indices clipped to the edges (so edge points self-compare and are
    # never extrema, but near-edge minima ARE detectable)
    idx = np.arange(n)
    keep = np.ones(n, bool)
    for shift in range(1, order + 1):
        keep &= env < env[np.clip(idx + shift, 0, n - 1)]
        keep &= env < env[np.clip(idx - shift, 0, n - 1)]
    return (np.flatnonzero(keep) + 1.0) / fps


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


# ------------------------------------------- R-precision / matching score
#
# The TM2T-family retrieval metrics of the reference's dead
# val_metrics.py:277-316 (imported nowhere upstream; round-3 verdict
# "missing #4"). Semantics preserved exactly: shuffle the N matched
# (condition, motion) embedding pairs, split into groups of ``r_size``
# (tail dropped, as upstream), compute the euclidean distance matrix
# between conditions and motions inside each group; matching score = mean
# over matched pairs of their distance (dist_mat.trace()/R_count);
# R-precision top-k = fraction of rows whose matched column ranks in the
# k nearest.
#
# Upstream assumes an external joint embedding space (TM2T's
# contrastively-trained text/motion encoders, never shipped). Here the
# joint space comes from :func:`fit_linear_probe`: a closed-form
# least-squares map from audio-conditioning features onto the motion
# embedding space, fit on GROUND-TRUTH pairs only. gt_R_precision then
# measures how identifiable real motion is from its audio under a linear
# probe, and R_precision (gen) whether generated motion is as identifiable
# - the same gen-vs-gt calibration pairing upstream reports.


def euclidean_distance_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """(N, D) x (M, D) -> (N, M) pairwise euclidean distances.

    Same expansion as the reference's euclidean_distance_matrix
    (|a|^2 - 2ab + |b|^2), clamped at zero before the sqrt.
    """
    d2 = (
        jnp.sum(a * a, axis=1, keepdims=True)
        - 2.0 * (a @ b.T)
        + jnp.sum(b * b, axis=1)[None, :]
    )
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def fit_linear_probe(
    cond: jax.Array, motion: jax.Array, l2: float = 1e-3
) -> jax.Array:
    """Ridge map W: [cond, 1] @ W ~= motion, fit in closed form.

    cond (N, Dc), motion (N, Dm) -> W (Dc+1, Dm). Apply with
    :func:`apply_linear_probe`. The small l2 keeps the normal equations
    well-posed when N < Dc (smoke-test regimes).
    """
    x = jnp.concatenate([cond, jnp.ones((cond.shape[0], 1), cond.dtype)], axis=1)
    gram = x.T @ x + l2 * jnp.eye(x.shape[1], dtype=cond.dtype)
    return jnp.linalg.solve(gram, x.T @ motion)


def apply_linear_probe(w: jax.Array, cond: jax.Array) -> jax.Array:
    x = jnp.concatenate([cond, jnp.ones((cond.shape[0], 1), cond.dtype)], axis=1)
    return x @ w


def cross_fit_linear_probe(
    cond: jax.Array,
    motion: jax.Array,
    n_folds: int = 4,
    l2: float = 1e-3,
    seed: int = 0,
) -> jax.Array:
    """Out-of-fold probe predictions: each row's cond_emb comes from a ridge
    probe fit WITHOUT that row.

    In-sample fitting near-interpolates whenever N < D (769-dim audio
    features vs a few hundred eval windows), pinning r_precision_*_real at
    ~1.0 regardless of any audio-motion relationship. K-fold cross-fitting
    makes the *_real suite an actual audio-identifiability measurement.
    Folds are a seeded permutation split; returns (N, Dm) predictions
    aligned with the input rows.
    """
    n = int(cond.shape[0])
    n_folds = max(2, min(n_folds, n))
    perm = np.random.default_rng(seed).permutation(n)
    out = np.zeros((n, motion.shape[1]), dtype=np.asarray(motion).dtype)
    for f in range(n_folds):
        test_idx = perm[f::n_folds]
        train_mask = np.ones(n, dtype=bool)
        train_mask[test_idx] = False
        w = fit_linear_probe(
            jnp.asarray(cond)[train_mask], jnp.asarray(motion)[train_mask], l2=l2
        )
        out[test_idx] = np.asarray(apply_linear_probe(w, jnp.asarray(cond)[test_idx]))
    return jnp.asarray(out)


def r_precision_suite(
    cond_emb: jax.Array,  # (N, D) condition embeddings, row i matches row i
    motion_emb: jax.Array,  # (N, D) motion embeddings in the SAME space
    r_size: int = 32,  # reference R_size (val_metrics.py:205)
    top_k: int = 3,  # reference top_k (val_metrics.py:204)
    seed: int = 0,
) -> dict[str, float]:
    """-> {matching_score, r_precision_top_1..top_k, r_count}.

    Requires N >= r_size (upstream asserts count_seq > R_size); the tail
    N % r_size pairs are dropped exactly as upstream's grouping does.
    """
    n = int(cond_emb.shape[0])
    if n < r_size:
        raise ValueError(f"need at least r_size={r_size} pairs, got {n}")
    perm = np.random.default_rng(seed).permutation(n)  # upstream randperm
    n_groups = n // r_size
    keep = perm[: n_groups * r_size]
    c = jnp.asarray(cond_emb)[keep].reshape(n_groups, r_size, -1)
    m = jnp.asarray(motion_emb)[keep].reshape(n_groups, r_size, -1)

    def per_group(cg, mg):
        dist = euclidean_distance_matrix(cg, mg)  # (R, R)
        match = jnp.trace(dist)
        # rank of the matched column per row: # of columns strictly nearer,
        # plus half of the off-diagonal TIES - a strict '<' alone would hand
        # a mode-collapsed generator (all embeddings identical, every row's
        # distances equal) rank 0 and a perfect top-1, where upstream's
        # argsort over duplicate values reads ~chance. Half-counting matches
        # the expectation of a random tiebreak.
        d_match = jnp.diagonal(dist)
        offdiag = ~jnp.eye(dist.shape[0], dtype=bool)
        rank = (
            jnp.sum(dist < d_match[:, None], axis=1)
            + 0.5 * jnp.sum((dist == d_match[:, None]) & offdiag, axis=1)
        )
        # top-k counts: rank < k (upstream calculate_top_k on argsort)
        topk = jnp.sum(rank[None, :] < jnp.arange(1, top_k + 1)[:, None], axis=1)
        return match, topk

    matches, topks = jax.vmap(per_group)(c, m)
    r_count = n_groups * r_size
    out = {"matching_score": float(jnp.sum(matches) / r_count),
           "r_count": float(r_count)}
    total_topk = jnp.sum(topks, axis=0)
    for k in range(top_k):
        out[f"r_precision_top_{k + 1}"] = float(total_topk[k] / r_count)
    return out
