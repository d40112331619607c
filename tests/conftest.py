"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-idiomatic "fake backend" for exercising pjit/shard_map
multi-chip code without TPU hardware (SURVEY.md section 4). Must run before
jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize force-registers the remote 'axon' TPU backend and
# overwrites jax_platforms to "axon,cpu" regardless of the environment; undo
# that so tests run on the local virtual-8-device CPU backend.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_config():
    from agdiff_tpu.config import ModelConfig

    # tiny network for fast tests; schedule kept full-length where cheap
    return ModelConfig(
        hidden_dim=32,
        num_convs=2,
        num_convs_local=2,
        num_diffusion_timesteps=100,
    )


@pytest.fixture(scope="session")
def tiny_batch():
    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset

    mols = synthetic_dataset(4, seed=1, min_heavy=3, max_heavy=5)
    return pad_molecules(mols, max_nodes=16, edge_order=3, batch_size=4)
