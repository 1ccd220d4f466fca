"""MFCC front-end + DTW alignment, jitted JAX.

Covers the reference's legacy audio path (dm/utils/wav_utils.py: audio2mfcc,
audio2dtw; torchaudio T.MFCC in infer_ldm.py:52-57): 13-coefficient MFCCs on
a mel spectrogram, and dynamic-time-warping alignment between two MFCC
sequences. The reference quotes "3.5 days for 10.5 hours of audio" for its
CPU DTW preprocessing (wav_utils.py:157) - here the cost matrix is one
batched matmul on device and the DP recursion is a `lax.scan` over
anti-diagonals-free rows (O(T^2) but fully vectorised per row).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from amuse_tpu.audio import fbank as fb


@functools.lru_cache(maxsize=4)
def _dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """Orthonormal DCT-II basis (torchaudio create_dct norm='ortho')."""
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    basis = np.cos(math.pi / n_mels * (n + 0.5) * k) * math.sqrt(2.0 / n_mels)
    basis[0] *= 1.0 / math.sqrt(2.0)
    return basis.astype(np.float32).T  # (n_mels, n_mfcc)


def mfcc(
    waveform: jax.Array,
    n_mfcc: int = 13,
    num_mel_bins: int = fb.NUM_MEL_BINS,
) -> jax.Array:
    """(..., N) waveform -> (..., T, n_mfcc) MFCCs via the Kaldi fbank."""
    logmel = fb.fbank(waveform, num_mel_bins)
    return logmel @ jnp.asarray(_dct_matrix(n_mfcc, num_mel_bins))


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
