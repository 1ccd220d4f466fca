from amuse_tpu.core import motion, rotations  # noqa: F401
