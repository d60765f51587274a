from dyffusion_tpu.diffusion.dyffusion import (  # noqa: F401
    DyffusionConfig,
    DyffusionEngine,
    StepMapping,
    parse_sampling_schedule,
)
from dyffusion_tpu.diffusion.schedules import (  # noqa: F401
    cosine_beta_schedule,
    linear_beta_schedule,
    make_beta_schedule,
)
