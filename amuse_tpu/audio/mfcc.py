"""MFCC front-end + DTW alignment, jitted JAX.

Covers the reference's legacy audio path (dm/utils/wav_utils.py: audio2mfcc,
audio2dtw): 13-coefficient MFCCs matching ``torchaudio.transforms.MFCC``
with the reference's exact melkwargs (configs/base_new.json:42-53: n_fft
2048, hop 128, 128 htk mels, power-spectrogram dB with top_db 80), and
dynamic-time-warping alignment between two MFCC sequences. The reference
quotes "3.5 days for 10.5 hours of audio" for its CPU DTW preprocessing
(wav_utils.py:157) - here the cost matrix is one batched matmul on device
and the DP recursion is a `lax.scan` over rows (O(T^2), vectorised per
row).

torchaudio itself is not installable in this environment, so the transform
is built to its documented semantics (center=True reflect padding, periodic
Hann, power 2.0, AmplitudeToDB(power) with per-tensor top_db clamp, ortho
DCT-II) rather than pinned against a recorded golden.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.audio import fbank as fb

SAMPLE_RATE = 16_000
N_FFT = 2048  # configs/base_new.json:42
HOP_LENGTH = 128  # :43 -> 125 MFCC frames per second
N_MELS = 128  # :44
TOP_DB = 80.0  # torchaudio AmplitudeToDB default used by T.MFCC


@functools.lru_cache(maxsize=4)
def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis (torchaudio create_dct norm='ortho')."""
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    basis = np.cos(math.pi / n_mels * (n + 0.5) * k) * math.sqrt(2.0 / n_mels)
    basis[0] *= 1.0 / math.sqrt(2.0)
    return basis.astype(np.float32).T  # (n_mels, n_mfcc)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=4)
def _mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int
) -> np.ndarray:
    """(n_freqs, n_mels) triangles - torchaudio melscale_fbanks(htk, norm=None)."""
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    pts = _mel_to_hz_htk(
        np.linspace(_hz_to_mel_htk(0.0), _hz_to_mel_htk(sample_rate / 2.0), n_mels + 2)
    )
    f_diff = np.diff(pts)  # (n_mels + 1,)
    slopes = pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


def mfcc(
    waveform: jax.Array,
    n_mfcc: int = 13,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    n_mels: int = N_MELS,
    sample_rate: int = SAMPLE_RATE,
) -> jax.Array:
    """(..., N) waveform -> (..., T, n_mfcc), T = N // hop + 1.

    The reference's ``T.MFCC(sample_rate=16000, n_mfcc=13, melkwargs=
    {n_fft: 2048, hop_length: 128, n_mels: 128, mel_scale: 'htk'})``
    (wav_utils.py:87-92): centered reflect-padded power spectrogram,
    htk mel bank, dB scale with an 80 dB floor below the peak, ortho DCT.
    Output is time-major (torchaudio returns (..., n_mfcc, T) - transposed).
    """
    pad = n_fft // 2
    x = jnp.pad(
        waveform,
        [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)],
        mode="reflect",
    )
    n_frames = waveform.shape[-1] // hop_length + 1
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )  # (T, n_fft) into the padded signal
    frames = x[..., idx]  # (..., T, n_fft)
    window = 0.5 * (
        1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    )  # periodic Hann (torch.hann_window default)
    spec = jnp.abs(jnp.fft.rfft(frames * jnp.asarray(window, frames.dtype))) ** 2
    mel = spec @ jnp.asarray(_mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate))
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    # AmplitudeToDB top_db clamp, PER waveform (reduce over this item's
    # (T, n_mels) plane only): a global max would couple batched items -
    # a quiet clip next to a loud one would get the loud clip's floor
    db = jnp.maximum(db, jnp.max(db, axis=(-2, -1), keepdims=True) - TOP_DB)
    return db @ jnp.asarray(_dct_matrix(n_mfcc, n_mels))


@jax.jit
def dtw_cost(a: jax.Array, b: jax.Array) -> jax.Array:
    """Accumulated DTW cost matrix between (Ta, D) and (Tb, D) sequences.

    Pairwise L2 cost from one matmul; the accumulation scans rows with a
    cummin carried across the row (associative-scan-free formulation).
    """
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    d = jnp.sqrt(jnp.maximum(a2 + b2 - 2.0 * (a @ b.T), 1e-12))  # (Ta, Tb)

    def row_step(prev_row, cost_row):
        # acc[i, j] = cost[i, j] + min(acc[i-1, j], acc[i-1, j-1], acc[i, j-1])
        diag = jnp.concatenate([jnp.asarray([jnp.inf]), prev_row[:-1]])
        base = jnp.minimum(prev_row, diag)

        def col_step(left, args):
            c, m = args
            val = c + jnp.minimum(m, left)
            return val, val

        _, row = jax.lax.scan(col_step, jnp.inf, (cost_row, base))
        return row, row

    first = jnp.cumsum(d[0])
    _, rows = jax.lax.scan(row_step, first, d[1:])
    return jnp.concatenate([first[None], rows], axis=0)


def dtw_path(acc: np.ndarray) -> list[tuple[int, int]]:
    """Backtrack the warping path from an accumulated cost matrix (host)."""
    i, j = acc.shape[0] - 1, acc.shape[1] - 1
    path = [(i, j)]
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            moves = [(acc[i - 1, j - 1], i - 1, j - 1),
                     (acc[i - 1, j], i - 1, j),
                     (acc[i, j - 1], i, j - 1)]
            _, i, j = min(moves)
        path.append((i, j))
    return path[::-1]


def align_mfcc(wave_a: jax.Array, wave_b: jax.Array, n_mfcc: int = 13):
    """Two waveforms -> (dtw distance, warping path). The reference's
    audio2dtw equivalent, at device speed."""
    ma, mb = mfcc(wave_a, n_mfcc), mfcc(wave_b, n_mfcc)
    acc = dtw_cost(ma, mb)
    dist = float(acc[-1, -1]) / (ma.shape[0] + mb.shape[0])
    return dist, dtw_path(np.asarray(acc))
