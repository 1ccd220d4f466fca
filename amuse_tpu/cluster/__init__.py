from amuse_tpu.cluster.jobs import JobLedger, JobSpec, LocalRunner, render_script  # noqa: F401
from amuse_tpu.cluster.sweep import ASHA, PRIOR_SPACE, sample_config  # noqa: F401
