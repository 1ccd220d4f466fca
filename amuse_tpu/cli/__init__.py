from amuse_tpu.cli.config import Config, load_config  # noqa: F401
