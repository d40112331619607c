from agdiff_tpu.models.schedules import get_beta_schedule, make_diffusion  # noqa: F401
from agdiff_tpu.models.dualenc import (  # noqa: F401
    DualEncoderEpsNetwork,
    ModelOutput,
    get_model,
)
