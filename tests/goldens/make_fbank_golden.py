"""Generate third-party Kaldi-fbank goldens via transformers.

The reference extracts features with ``torchaudio.compliance.kaldi.fbank(
htk_compat=True, sample_frequency=16000, use_energy=False,
window_type='hanning', num_mel_bins=128, dither=0.0, frame_shift=10)``
(dm/dm.py:429-437). ``transformers.ASTFeatureExtractor`` reimplements that
exact call in numpy when torchaudio is absent (feature_extraction_audio_
spectrogram_transformer.py: spectrogram(frame_length=400, hop_length=160,
fft_length=512, power=2, preemphasis=0.97, remove_dc_offset=True,
mel_scale="kaldi", triangularize_in_mel_space=True); htk_compat only moves
the energy column, which use_energy=False drops). That gives an external,
independently-authored oracle for the front-end.

Run:  python tests/goldens/make_fbank_golden.py
Writes tests/goldens/fbank_transformers.npz (committed).
"""

from pathlib import Path

import numpy as np


def make_waveforms() -> dict[str, np.ndarray]:
    rng = np.random.default_rng(1234)
    t = np.arange(160_000, dtype=np.float64) / 16_000.0
    chirp = 0.3 * np.sin(2 * np.pi * (200 * t + 800 * t**2 / 2))
    noise = 0.02 * rng.standard_normal(160_000)
    speechish = (chirp + noise).astype(np.float32)
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    return {"speechish": speechish, "tone440": tone}


def main() -> None:
    import transformers
    from transformers import ASTFeatureExtractor
    from transformers.utils import is_speech_available

    assert not is_speech_available(), (
        "torchaudio is installed; this generator records the numpy fallback "
        "path - results would be torchaudio's instead (equivalent, but note "
        "it in the npz metadata if you regenerate)"
    )
    fe = ASTFeatureExtractor(num_mel_bins=128, max_length=1024, do_normalize=False)
    out = {}
    for name, wave in make_waveforms().items():
        wave = wave - wave.mean()  # reference mean-subtracts first (dm.py:426)
        out[f"wave_{name}"] = wave
        out[f"fbank_{name}"] = fe._extract_fbank_features(wave, max_length=1024)
    out["transformers_version"] = np.array(transformers.__version__)
    np.savez_compressed(Path(__file__).parent / "fbank_transformers.npz", **out)
    for k, v in out.items():
        if k.startswith("fbank"):
            print(k, v.shape, float(v.mean()), float(v.std()))


if __name__ == "__main__":
    main()
