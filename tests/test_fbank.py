"""Tests for the Kaldi-parity fbank front-end.

An independent float64 NumPy implementation of the same Kaldi spec serves as
the cross-check oracle, plus distribution checks against the recorded BEAT
dataset statistics on a real reference WAV (configs/base_new.json:142-143).
"""

import math
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from amuse_tpu.audio import fbank as fb
from amuse_tpu.audio.wavio import load_wav

REF_WAV = Path("/root/reference/viz_dump/test/speech")


def numpy_kaldi_fbank(wave: np.ndarray, num_bins: int = 128) -> np.ndarray:
    """Independent float64 oracle for Kaldi fbank (same published spec)."""
    wave = wave.astype(np.float64)
    n_frames = 1 + (len(wave) - 400) // 160
    out = np.zeros((n_frames, num_bins))
    window = 0.5 - 0.5 * np.cos(2 * math.pi * np.arange(400) / 399.0)
    # mel bank
    def mel(f):
        return 1127.0 * np.log(1.0 + f / 700.0)

    low, high = mel(20.0), mel(8000.0)
    delta = (high - low) / (num_bins + 1)
    fft_freqs = (16000.0 / 512.0) * np.arange(256)
    mel_f = mel(fft_freqs)
    bank = np.zeros((256, num_bins))
    for b in range(num_bins):
        lft, ctr, rgt = low + b * delta, low + (b + 1) * delta, low + (b + 2) * delta
        up = (mel_f - lft) / (ctr - lft)
        dn = (rgt - mel_f) / (rgt - ctr)
        bank[:, b] = np.maximum(0.0, np.minimum(up, dn))
    for t in range(n_frames):
        fr = wave[t * 160 : t * 160 + 400].copy()
        fr -= fr.mean()
        pre = np.concatenate([[fr[0]], fr[:-1]])
        fr = fr - 0.97 * pre
        fr *= window
        padded = np.zeros(512)
        padded[:400] = fr
        spec = np.abs(np.fft.rfft(padded)[:256]) ** 2
        melspec = spec @ bank
        out[t] = np.log(np.maximum(melspec, 1.1920928955078125e-07))
    return out


class TestFbankParity:
    def test_matches_numpy_oracle_random(self):
        rng = np.random.default_rng(0)
        wave = rng.normal(scale=0.1, size=16000).astype(np.float32)
        ours = np.asarray(fb.fbank(jnp.asarray(wave)))
        oracle = numpy_kaldi_fbank(wave)
        assert ours.shape == oracle.shape == (98, 128)
        np.testing.assert_allclose(ours, oracle, atol=1e-3)

    def test_matches_numpy_oracle_sine(self):
        t = np.arange(8000) / 16000.0
        wave = (0.5 * np.sin(2 * math.pi * 440.0 * t)).astype(np.float32)
        ours = np.asarray(fb.fbank(jnp.asarray(wave)))
        oracle = numpy_kaldi_fbank(wave)
        np.testing.assert_allclose(ours, oracle, atol=1e-3)

    def test_sine_peak_at_expected_mel_bin(self):
        # A 1 kHz tone must peak at the mel bin whose center is nearest 1 kHz.
        t = np.arange(16000) / 16000.0
        wave = (0.5 * np.sin(2 * math.pi * 1000.0 * t)).astype(np.float32)
        out = np.asarray(fb.fbank(jnp.asarray(wave)))
        peak_bin = int(out.mean(axis=0).argmax())

        def mel(f):
            return 1127.0 * math.log(1.0 + f / 700.0)

        low, high = mel(20.0), mel(8000.0)
        delta = (high - low) / 129.0
        center = (mel(1000.0) - low) / delta - 1.0
        assert abs(peak_bin - center) <= 1.5

    def test_frame_count_10s(self):
        wave = jnp.zeros(160000)
        out = fb.fbank(wave)
        assert out.shape == (998, 128)
        padded = fb.pad_or_crop(out)
        assert padded.shape == (1024, 128)


class TestChunkPipeline:
    def test_full_chunk_pipeline_shapes(self):
        rng = np.random.default_rng(1)
        chunk = rng.normal(scale=0.05, size=(2, 160000)).astype(np.float32)
        out = fb.wav_chunk_to_fbank(jnp.asarray(chunk))
        assert out.shape == (2, 1024, 128)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_padding_region_is_normalized_zero(self):
        chunk = np.random.default_rng(2).normal(size=160000).astype(np.float32) * 0.1
        out = np.asarray(fb.wav_chunk_to_fbank(jnp.asarray(chunk)))
        # frames 998.. are zero-padded then normalised: (0 - mean) / (2 std)
        expected = (0.0 - fb.DATASET_MEAN) / (2 * fb.DATASET_STD)
        np.testing.assert_allclose(out[998:], expected, atol=1e-5)

    @pytest.mark.skipif(not REF_WAV.exists(), reason="reference wavs absent")
    def test_real_wav_statistics_near_beat_recorded(self):
        # The recorded BEAT stats are mean=-9.17, std=5.06 over speech fbanks;
        # any real 16 kHz speech file must land in the same ballpark.
        from amuse_tpu.audio.wavio import load_wav_resampled

        wavs = sorted(REF_WAV.glob("*.wav"))
        assert wavs, "no reference wavs found"
        wave = load_wav_resampled(wavs[0])  # demo wavs are 44.1 kHz
        chunks = fb.window_waveform(wave)
        raw = np.asarray(fb.wav_chunk_to_fbank(jnp.asarray(chunks[0]), normalized=False))
        speech_part = raw[:998]  # exclude padding
        assert -16.0 < speech_part.mean() < -4.0, speech_part.mean()
        assert 2.0 < speech_part.std() < 9.0, speech_part.std()

    def test_window_waveform_strides(self):
        wave = np.arange(480000, dtype=np.float32)
        chunks = fb.window_waveform(wave)
        assert chunks.shape == (3, 160000)
        # intent mode: disjoint windows
        assert chunks[1][0] - chunks[0][0] == 160000.0
        quirk = fb.window_waveform(wave, reference_quirk=True)
        # reference quirk mode: windows shifted by one sample
        assert quirk[1][0] - quirk[0][0] == 1.0

    def test_parity_vs_transformers_golden(self):
        """External third-party oracle: huggingface transformers'
        ASTFeatureExtractor reimplements the exact torchaudio Kaldi fbank
        call of the reference (dm/dm.py:429-437) in numpy. The committed
        golden (tests/goldens/make_fbank_golden.py) pins our front-end to
        independently-authored code, not a same-author spec reading."""
        d = np.load(Path(__file__).parent / "goldens" / "fbank_transformers.npz")
        for name in ["speechish", "tone440"]:
            mine = np.asarray(
                fb.pad_or_crop(fb.fbank(jnp.asarray(d[f"wave_{name}"])))
            )
            ref = d[f"fbank_{name}"]
            assert mine.shape == ref.shape == (1024, 128)
            # f32 pipeline vs f64 oracle in log-mel space
            np.testing.assert_allclose(mine, ref, atol=2e-2)
            assert np.abs(mine - ref).mean() < 3e-3

    def test_mel_bank_structure(self):
        bank = fb._mel_bank_np()
        assert bank.shape == (257, 128)
        assert bank[256].sum() == 0.0  # Nyquist column dropped
        # With 128 bins over [20, 8000] Hz the narrowest low-frequency
        # triangles can miss every 31.25 Hz FFT grid point (true of Kaldi
        # too); the overwhelming majority must still have support.
        assert (bank.sum(axis=0) > 0).sum() >= 120
        assert bank.sum() > 0
