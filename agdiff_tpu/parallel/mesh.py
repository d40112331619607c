"""Device mesh and sharding helpers.

The reference has no multi-device support of any kind (SURVEY.md section 2.5:
no torch.distributed imports, single-process single-GPU loop). The TPU-native
scaling story is data parallelism over ICI: a 1-D ('dp',) mesh, parameters
replicated, the molecule batch sharded on its leading axis. Gradients are
combined by XLA-inserted collectives (psum over 'dp') via the SPMD
partitioner — no hand-written NCCL/MPI analogs.

The model is small (~2M params), so tensor/pipeline parallelism buys nothing;
DP + static bucketing covers both training throughput and generation fan-out
(per-chip molecule shards).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (graph) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
