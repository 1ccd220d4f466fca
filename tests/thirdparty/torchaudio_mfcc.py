"""Test-only oracle: torchaudio ``transforms.MFCC`` functional path in torch.

The reference's legacy audio front-end builds ``torchaudio.transforms.MFCC(
sample_rate=16000, n_mfcc=13, melkwargs={n_fft: 2048, n_mels: 128/24,
hop_length: 128, mel_scale: "htk"})`` (dm/utils/wav_utils.py:87-92,210-215).
torchaudio is not installed and cannot be fetched here (zero egress), so this
module reconstructs the exact functional chain of the public BSD-licensed
torchaudio implementation the transform composes:

  MelSpectrogram  = torch.stft(center=True, reflect, periodic Hann,
                    normalized=False, onesided) -> |.|^2
                    -> melscale_fbanks(f_min=0, f_max=sr/2, htk, norm=None)
  AmplitudeToDB   = 10*log10(clamp(x, 1e-10)) with per-spectrogram top_db=80
  MFCC            = ortho DCT-II over the mel axis (functional.create_dct)

Executed under torch (torch.stft is a genuinely independent STFT runtime) by
tests/test_mfcc_oracle.py and compared against amuse_tpu.audio.mfcc; the mel
filterbank is additionally cross-checked against the INSTALLED external
``transformers.audio_utils.mel_filter_bank`` in that test.
"""

from __future__ import annotations

import math

import torch


def create_dct(n_mfcc: int, n_mels: int, norm: str = "ortho") -> torch.Tensor:
    """torchaudio.functional.create_dct -> (n_mels, n_mfcc)."""
    n = torch.arange(float(n_mels))
    k = torch.arange(float(n_mfcc)).unsqueeze(1)
    dct = torch.cos(math.pi / float(n_mels) * (n + 0.5) * k)
    if norm is None:
        dct *= 2.0
    else:
        assert norm == "ortho"
        dct[0] *= 1.0 / math.sqrt(2.0)
        dct *= math.sqrt(2.0 / float(n_mels))
    return dct.t()


def _hz_to_mel(freq: torch.Tensor, mel_scale: str = "htk") -> torch.Tensor:
    assert mel_scale == "htk"
    return 2595.0 * torch.log10(1.0 + freq / 700.0)


def _mel_to_hz(mels: torch.Tensor, mel_scale: str = "htk") -> torch.Tensor:
    assert mel_scale == "htk"
    return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)


def melscale_fbanks(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
    norm: str | None = None,
    mel_scale: str = "htk",
) -> torch.Tensor:
    """torchaudio.functional.melscale_fbanks -> (n_freqs, n_mels)."""
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs)
    m_min = _hz_to_mel(torch.tensor(f_min), mel_scale)
    m_max = _hz_to_mel(torch.tensor(f_max), mel_scale)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, mel_scale)
    # triangles via slopes (upstream _create_triangular_filterbank)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels + 1,)
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)  # (n_freqs, n_mels + 2)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    fb = torch.max(torch.zeros(1), torch.min(down_slopes, up_slopes))
    assert norm is None
    return fb


def spectrogram_power(
    waveform: torch.Tensor, n_fft: int, hop_length: int
) -> torch.Tensor:
    """torchaudio.functional.spectrogram with power=2.0 and transform
    defaults (center=True reflect pad, periodic Hann, normalized=False,
    onesided) -> (..., n_fft//2+1, T)."""
    window = torch.hann_window(n_fft)
    spec_f = torch.stft(
        waveform,
        n_fft=n_fft,
        hop_length=hop_length,
        win_length=n_fft,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec_f.abs().pow(2.0)


def amplitude_to_db(
    x: torch.Tensor, top_db: float = 80.0, amin: float = 1e-10
) -> torch.Tensor:
    """torchaudio.functional.amplitude_to_DB for power spectrograms
    (multiplier 10, ref_value 1 -> db_multiplier 0), per-spectrogram top_db."""
    x_db = 10.0 * torch.log10(torch.clamp(x, min=amin))
    shape = x_db.size()
    packed_channels = shape[-3] if x_db.dim() > 2 else 1
    x_db = x_db.reshape(-1, packed_channels, shape[-2], shape[-1])
    x_db = torch.max(
        x_db, (x_db.amax(dim=(-3, -2, -1)) - top_db).view(-1, 1, 1, 1)
    )
    return x_db.reshape(shape)


def mfcc(
    waveform: torch.Tensor,
    sample_rate: int = 16000,
    n_mfcc: int = 13,
    n_fft: int = 2048,
    hop_length: int = 128,
    n_mels: int = 128,
) -> torch.Tensor:
    """T.MFCC(log_mels=False) forward -> (..., n_mfcc, T)."""
    spec = spectrogram_power(waveform, n_fft, hop_length)
    fb = melscale_fbanks(
        n_fft // 2 + 1, 0.0, sample_rate / 2.0, n_mels, sample_rate,
        norm=None, mel_scale="htk",
    )
    mel = torch.matmul(spec.transpose(-1, -2), fb).transpose(-1, -2)
    mel_db = amplitude_to_db(mel, top_db=80.0)
    dct_mat = create_dct(n_mfcc, n_mels, norm="ortho")
    return torch.matmul(mel_db.transpose(-1, -2), dct_mat).transpose(-1, -2)
