"""Kaldi-compatible log-mel filterbank front-end, jitted JAX.

Reproduces the exact semantics the reference uses everywhere it touches audio
(reference: dm/dm.py:429-437, models/latent_diffusion/infer_ldm.py:421-432):

    torchaudio.compliance.kaldi.fbank(
        wave, htk_compat=True, sample_frequency=16000, use_energy=False,
        window_type='hanning', num_mel_bins=128, dither=0.0, frame_shift=10)

followed by zero-padding/cropping to ``target_length=1024`` frames and the
dataset normalisation ``(x - mean) / (2 * std)`` with the recorded BEAT stats
mean=-9.173025, std=5.062332 (configs/base_new.json:142-143).

Kaldi fbank semantics implemented here (torchaudio-compliance defaults):
  * frame_length 25 ms -> 400 samples, frame_shift 10 ms -> 160 samples
  * snip_edges=True framing: n_frames = 1 + (N - 400) // 160
  * per-frame DC-offset removal (remove_dc_offset=True)
  * pre-emphasis 0.97 with the first sample pre-emphasised against itself
  * symmetric (periodic=False) Hann window
  * zero-pad each frame to the next power of two (512) before the FFT
  * power spectrum |rfft|^2 (257 bins)
  * Kaldi-style triangular mel bank, HTK mel scale 1127*ln(1+f/700),
    low=20 Hz, high=Nyquist, defined on the first 256 bins (the Nyquist
    column of the spectrum is dropped by a zero filter weight)
  * log(max(x, float32_eps))
  * htk_compat only reorders the energy column; with use_energy=False it is
    a no-op, so it does not appear below.

Everything is static-shaped so the whole front-end fuses into one XLA
program; for arbitrary-length audio use :func:`window_waveform` to get a
batch of 10 s chunks first.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16_000
CHUNK_SAMPLES = 160_000  # 10 s (reference: dm/dm.py:426-428)
FRAME_LENGTH = 400  # 25 ms
FRAME_SHIFT = 160  # 10 ms
PADDED_WINDOW = 512  # next power of two
NUM_MEL_BINS = 128
TARGET_FRAMES = 1024  # reference: configs/base_new.json:138
PREEMPHASIS = 0.97
LOG_EPS = 1.1920928955078125e-07  # float32 machine eps, Kaldi's log floor

# Recorded BEAT training-set statistics (reference: configs/base_new.json:142).
DATASET_MEAN = -9.173025
DATASET_STD = 5.062332


def _mel(freq):
    return 1127.0 * np.log1p(np.asarray(freq, np.float64) / 700.0)


@functools.lru_cache(maxsize=4)
def _mel_bank_np(
    num_bins: int = NUM_MEL_BINS,
    padded_window: int = PADDED_WINDOW,
    sample_rate: int = SAMPLE_RATE,
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """Kaldi triangular mel filterbank, shape (padded_window//2 + 1, num_bins).

    Built in float64 numpy once at trace time; the extra Nyquist row is zero
    so a single (257, 128) matmul applies the bank on the MXU.
    """
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    n_fft_bins = padded_window // 2
    fft_bin_width = sample_rate / padded_window
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bin_idx = np.arange(num_bins, dtype=np.float64)[:, None]
    left_mel = mel_low + bin_idx * mel_delta
    center_mel = left_mel + mel_delta
    right_mel = center_mel + mel_delta

    freqs = fft_bin_width * np.arange(n_fft_bins, dtype=np.float64)[None, :]
    mel_freqs = _mel(freqs)
    up = (mel_freqs - left_mel) / (center_mel - left_mel)
    down = (right_mel - mel_freqs) / (right_mel - center_mel)
    bank = np.maximum(0.0, np.minimum(up, down))  # (num_bins, 256)

    full = np.zeros((n_fft_bins + 1, num_bins), dtype=np.float32)
    full[:n_fft_bins, :] = bank.T.astype(np.float32)
    return full


@functools.lru_cache(maxsize=2)
def _hann_np(length: int = FRAME_LENGTH) -> np.ndarray:
    # Symmetric Hann (torch.hann_window(periodic=False)).
    i = np.arange(length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * math.pi * i / (length - 1))).astype(np.float32)


def frame_signal(waveform: jax.Array) -> jax.Array:
    """(..., N) -> (..., n_frames, FRAME_LENGTH) with snip_edges framing."""
    n = waveform.shape[-1]
    n_frames = 1 + (n - FRAME_LENGTH) // FRAME_SHIFT
    starts = jnp.arange(n_frames) * FRAME_SHIFT
    idx = starts[:, None] + jnp.arange(FRAME_LENGTH)[None, :]
    return waveform[..., idx]


def fbank(waveform: jax.Array, num_mel_bins: int = NUM_MEL_BINS) -> jax.Array:
    """Kaldi log-mel fbank of a mono waveform (..., N) -> (..., n_frames, bins)."""
    frames = frame_signal(waveform.astype(jnp.float32))
    # remove_dc_offset=True: subtract per-frame mean.
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # Pre-emphasis with Kaldi's offset convention: frame[0] uses itself.
    prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
    frames = frames - PREEMPHASIS * prev
    frames = frames * jnp.asarray(_hann_np())
    frames = jnp.pad(
        frames,
        [(0, 0)] * (frames.ndim - 1) + [(0, PADDED_WINDOW - FRAME_LENGTH)],
    )
    spectrum = jnp.abs(jnp.fft.rfft(frames, axis=-1)) ** 2  # (..., T, 257)
    mel = spectrum @ jnp.asarray(_mel_bank_np(num_bins=num_mel_bins))
    return jnp.log(jnp.maximum(mel, LOG_EPS))


def pad_or_crop(fb: jax.Array, target_frames: int = TARGET_FRAMES) -> jax.Array:
    """Zero-pad (below) or crop the time axis to ``target_frames`` frames.

    Mirrors the reference's ZeroPad2d / slice logic (dm/dm.py:431-437).
    """
    t = fb.shape[-2]
    if t < target_frames:
        return jnp.pad(
            fb, [(0, 0)] * (fb.ndim - 2) + [(0, target_frames - t), (0, 0)]
        )
    return fb[..., :target_frames, :]


def normalize(fb: jax.Array, mean: float = DATASET_MEAN, std: float = DATASET_STD) -> jax.Array:
    """Dataset normalisation (x - mean) / (2 * std) (reference: dm/dm.py:609)."""
    return (fb - mean) / (2.0 * std)


@functools.partial(jax.jit, static_argnames=("normalized",))
def wav_chunk_to_fbank(chunk: jax.Array, normalized: bool = True) -> jax.Array:
    """One 10 s mean-subtracted chunk (..., 160000) -> (..., 1024, 128) fbank.

    The full reference front-end for a chunk: fbank -> pad to 1024 ->
    normalise. 160000 samples give 998 frames, zero-padded to 1024.
    """
    fb = pad_or_crop(fbank(chunk))
    return normalize(fb) if normalized else fb


def make_sharded_fbank(mesh):
    """(N, 160000) numpy -> (N, 1024, 128) numpy, sharded over mesh "data".

    The stage-1 fbank pass is the expensive prepare_data leg at BEAT scale
    (1,941 takes); each chunk is independent (per-frame DC removal,
    dataset-constant normalisation), so it shard_maps with no collectives.
    Pads the chunk batch up to the data-axis size and strips the pad rows;
    bytes are pinned identical to single-device ``wav_chunk_to_fbank``
    (tests/test_stage1_dataset.py::TestShardedFbank).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    sharded = jax.jit(
        jax.shard_map(
            wav_chunk_to_fbank,
            mesh=mesh,
            in_specs=P(mesh.axis_names[0]),
            out_specs=P(mesh.axis_names[0]),
        )
    )

    def run(chunks: np.ndarray) -> np.ndarray:
        chunks = np.asarray(chunks, np.float32)
        n = chunks.shape[0]
        pad = (-n) % n_dev
        if pad:
            chunks = np.concatenate(
                [chunks, np.zeros((pad,) + chunks.shape[1:], chunks.dtype)]
            )
        with mesh:
            out = sharded(jax.device_put(chunks, sharding))
        return np.asarray(out)[:n]

    return run


def window_waveform(waveform: np.ndarray, reference_quirk: bool = False) -> np.ndarray:
    """Full-length mono waveform -> (n_chunks, 160000) of 10 s chunks.

    Host-side prep mirroring dm/dm.py:595 & infer_ldm.py:419: mean-subtract
    the *whole* file once, then slice floor(N / 160000) chunks.

    NOTE (faithful quirk): the reference loops ``waveform[:, k:k+160000]``
    with the *loop index* as the start sample (dm/dm.py:427,598;
    infer_ldm.py:421), so chunk k >= 1 overlaps chunk 0 in all but k
    samples — every audio chunk is effectively the first 10 s of the take.
    Default here is the evident intent (starts at k*160000); pass
    ``reference_quirk=True`` to reproduce the reference bit-for-bit when
    validating parity against its checkpoints.
    """
    wave = np.asarray(waveform, np.float32)
    if wave.ndim == 2:  # (channels, N) -> first channel, like kaldi fbank
        wave = wave[0]
    wave = wave - wave.mean()
    n_chunks = wave.shape[0] // CHUNK_SAMPLES
    if n_chunks == 0:
        raise ValueError(
            f"waveform too short: {wave.shape[0]} samples < {CHUNK_SAMPLES}"
        )
    if reference_quirk:
        return np.stack([wave[k : k + CHUNK_SAMPLES] for k in range(n_chunks)])
    return wave[: n_chunks * CHUNK_SAMPLES].reshape(n_chunks, CHUNK_SAMPLES)
