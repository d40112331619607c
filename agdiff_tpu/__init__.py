"""agdiff_tpu — a TPU-native (JAX/XLA/Pallas) framework for molecular conformer
generation by denoising diffusion, with the capabilities of ADicksonLab/AGDIFF.

Design (TPU-first, NOT a port):
  * Graphs are represented as dense, statically-shaped padded buckets
    (``GraphBatch``): typed adjacency matrices + node masks, so every op maps
    onto the MXU/VPU with one XLA compilation per bucket size. This replaces
    the reference's PyG dynamic edge-list batching + torch-scatter/-sparse/
    -cluster CUDA kernels (reference: src/agdiff/models/common.py:135-264).
  * The 5000-step annealed Langevin sampler is a single ``jax.lax.scan``
    (reference: src/agdiff/models/epsnet/dualenc.py:441-547 runs a Python
    loop with a host sync per step).
  * Multi-chip scaling is data parallelism over a ``jax.sharding.Mesh``
    (the reference has no distributed support at all).
  * Chemistry interop (RDKit) stays on the host, outside the jit boundary,
    and is optional: a native C++ symmetry-aware RMSD kernel replaces
    RDKit's GetBestRMS for evaluation (reference: src/agdiff/utils/chem.py:133-137).
"""

__version__ = "0.1.0"

from agdiff_tpu.config import (  # noqa: F401
    ModelConfig,
    TrainConfig,
    OptimizerConfig,
    SchedulerConfig,
    DatasetConfig,
    Config,
    load_config,
)
