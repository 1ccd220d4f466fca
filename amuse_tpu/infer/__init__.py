from amuse_tpu.infer.pipeline import (  # noqa: F401
    GesturePipeline,
    PipelineParams,
    init_random_params,
)
