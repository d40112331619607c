"""Device mesh and sharding helpers.

The reference has no multi-device support of any kind (SURVEY.md section 2.5:
no torch.distributed imports, single-process single-GPU loop). The TPU-native
scaling story is data parallelism over ICI: a 1-D ('dp',) mesh, parameters
replicated, the molecule batch sharded on its leading axis. Gradients are
combined by XLA-inserted collectives (psum over 'dp') via the SPMD
partitioner — no hand-written NCCL/MPI analogs.

The model is small (~2M params), so at flagship size DP + static bucketing
covers both training throughput and generation fan-out (per-chip molecule
shards). For scaled-up configs, sharded-parameter layouts (FSDP over
('dp','fsdp'), tensor parallelism over ('dp','tp')) live in
parallel/sharded.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "dp",
              dcn_slices: int = 1) -> Mesh:
    """Data-parallel mesh over the first `num_devices` devices.

    dcn_slices > 1 builds a 2-D ('dcn', 'dp') mesh for multi-slice training
    (the Drugs-scale config, SURVEY.md section 2.5): gradient psum runs
    hierarchically — within a slice over ICI, across slices over DCN. The
    batch stays sharded over both axes (pure DP), so no resharding of
    parameters is ever needed."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    if dcn_slices > 1:
        if len(devices) % dcn_slices:
            raise ValueError(
                f"{len(devices)} devices not divisible by {dcn_slices} slices"
            )
        arr = np.array(devices).reshape(dcn_slices, -1)
        return Mesh(arr, ("dcn", axis_name))
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Shard the leading (graph) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
