from agdiff_tpu.sampling.langevin import (  # noqa: F401
    SamplerConfig,
    langevin_dynamics_sample,
    build_sampler,
)
