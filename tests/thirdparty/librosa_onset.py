"""Reconstruction of librosa's onset pipeline, used as a metric oracle.

librosa is not installable here (zero egress), so — exactly like the
diffusers/torchaudio oracles in this directory — this is a careful
reconstruction of the upstream implementation from its published source
(librosa 0.10, librosa/onset.py + librosa/util/utils.py), kept INDEPENDENT
of the production code in amuse_tpu/eval/metrics.py: this module mirrors
librosa's scipy.ndimage filter calls (sizes, origins, boundary modes) while
the production code is a direct pure-numpy statement of the documented
conditions. Agreement between the two (tests/test_eval_metrics.py) is the
oracle; a shared misreading of upstream remains the residual risk, as
documented for the other oracles (docs/STATUS.md).

Reconstructed surfaces:
  * onset_strength(S=mel_db, lag=1, aggregate=np.mean, detrend=False):
      env[t] = mean_f max(0, S[f, t+lag] - S[f, t])
    (librosa computes the diff along frames of the dB-scaled mel power
    spectrogram; its ``center`` frame-shift compensates its own centered
    STFT padding, which our snip-edges Kaldi framing does not have, so the
    oracle is exercised on the shared spectrogram->envelope contract.)
  * util.peak_pick(x, pre_max, post_max, pre_avg, post_avg, delta, wait):
      i is a peak iff x[i] == max(x[i-pre_max : i+post_max])   (sliding max,
                       scipy maximum_filter1d, mode="constant", cval=0.0)
                 and x[i] >= mean(x[i-pre_avg : i+post_avg]) + delta
                       (uniform_filter1d, mode="nearest")
                 and i - previous_peak > wait (greedy left-to-right).
  * onset_detect's documented default windows: pre_max = 0.03 s, post_max =
    0 s + 1 frame, pre_avg = 0.10 s, post_avg = 0.10 s + 1 frame, wait =
    0.03 s, delta = 0.07, each floor-divided by the hop (librosa:
    ``0.03 * sr // hop_length``).
"""

from __future__ import annotations

import numpy as np
import scipy.ndimage


def onset_strength_from_mel_db(mel_db: np.ndarray, lag: int = 1) -> np.ndarray:
    """(T, n_mels) dB mel spectrogram -> (T-lag,) onset envelope."""
    s = np.asarray(mel_db, np.float64).T  # librosa works (n_mels, T)
    diff = s[:, lag:] - s[:, :-lag]
    return np.mean(np.maximum(0.0, diff), axis=0)


def peak_pick(
    x: np.ndarray,
    pre_max: int,
    post_max: int,
    pre_avg: int,
    post_avg: int,
    delta: float,
    wait: int,
) -> np.ndarray:
    """librosa.util.peak_pick via the same scipy.ndimage calls it makes."""
    x = np.asarray(x, np.float64)
    if x.size == 0:
        return np.zeros(0, np.int64)
    max_length = pre_max + post_max
    max_origin = int(np.ceil(0.5 * (pre_max - post_max)))
    mov_max = scipy.ndimage.maximum_filter1d(
        x, int(max_length), mode="constant", origin=max_origin, cval=0.0
    )
    avg_length = pre_avg + post_avg
    avg_origin = int(np.ceil(0.5 * (pre_avg - post_avg)))
    mov_avg = scipy.ndimage.uniform_filter1d(
        x, int(avg_length), mode="nearest", origin=avg_origin
    )
    candidates = np.flatnonzero((x == mov_max) & (x >= mov_avg + delta))
    peaks: list[int] = []
    for i in candidates:
        if not peaks or i - peaks[-1] > wait:
            peaks.append(int(i))
    return np.asarray(peaks, np.int64)


def onset_detect_default_params(sr: float, hop_length: float) -> dict:
    """onset_detect's documented kwarg defaults, in frames."""
    return dict(
        pre_max=int(0.03 * sr // hop_length),
        post_max=int(0.00 * sr // hop_length + 1),
        pre_avg=int(0.10 * sr // hop_length),
        post_avg=int(0.10 * sr // hop_length + 1),
        wait=int(0.03 * sr // hop_length),
        delta=0.07,
    )


def kinematic_beats_aistpp(joints: np.ndarray, order: int = 10) -> np.ndarray:
    """Li et al. 2021 (AIST++) motion-beat frames, via scipy argrelextrema.

    Their published construction: per-frame velocity norms summed over
    joints, beats = scipy.signal.argrelextrema(envelope, np.less,
    order=order) (strict local minima; order=10 at 60 fps).
    Returns envelope indices (the production code maps index i to motion
    frame i+1 and seconds).
    """
    import scipy.signal

    j = np.asarray(joints, np.float64)
    vel = np.linalg.norm(np.diff(j, axis=0), axis=-1)
    env = vel.sum(axis=-1) if vel.ndim == 2 else vel
    return scipy.signal.argrelextrema(env, np.less, order=order)[0]
