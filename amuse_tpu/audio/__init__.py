from amuse_tpu.audio import fbank  # noqa: F401
from amuse_tpu.audio.fbank import wav_chunk_to_fbank, window_waveform  # noqa: F401
