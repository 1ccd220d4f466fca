from amuse_tpu.eval.metrics import (  # noqa: F401
    ape,
    ave,
    beat_alignment,
    diversity,
    fgd,
    gaussian_frechet_distance,
)
