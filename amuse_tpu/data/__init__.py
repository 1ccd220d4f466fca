from amuse_tpu.data import actors  # noqa: F401
