from amuse_tpu.train import audio, checkpoint, gesture, losses  # noqa: F401
