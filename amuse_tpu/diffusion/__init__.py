from amuse_tpu.diffusion.sampler import ddim_sample  # noqa: F401
from amuse_tpu.diffusion.schedulers import (  # noqa: F401
    DiffusionSchedule,
    add_noise,
    ddim_step,
    ddim_timesteps,
    make_schedule,
)
