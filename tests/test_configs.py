"""Every shipped YAML config must load into the typed schema and build a
working train state (guards the fast-recipe and reference-parity configs
against schema drift)."""

import glob
import os

import jax
import pytest

from agdiff_tpu.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_loads(path):
    cfg = load_config(path)
    assert cfg.model.hidden_dim > 0
    assert cfg.train.batch_size > 0
    assert cfg.model.num_timesteps > 0


def test_fast_recipe_builds_and_steps():
    """qm9_fast.yml (bf16 + packed_pairs + chunked) must run a real chunked
    train step at tiny size."""
    import dataclasses

    import numpy as np

    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset
    from agdiff_tpu.train.train_step import (
        create_train_state,
        make_chunked_train_step,
        stack_batches,
    )

    cfg = load_config(os.path.join(CONFIG_DIR, "qm9_fast.yml"))
    assert cfg.model.packed_pairs and cfg.model.dtype == "bfloat16"
    assert cfg.train.step_chunk == 16
    # shrink for CPU
    small = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, hidden_dim=32, num_convs=2,
                                  num_convs_local=2,
                                  num_diffusion_timesteps=50),
        train=dataclasses.replace(cfg.train, batch_size=4, step_chunk=2),
    )
    mols = synthetic_dataset(4, seed=0, min_heavy=4, max_heavy=6)
    batch = pad_molecules(mols, 24, batch_size=4)
    model, state = create_train_state(small, jax.random.PRNGKey(0),
                                      max_nodes=24, batch_size=4)
    step = make_chunked_train_step(model, small, small.train.step_chunk,
                                   donate=False)
    stacked = stack_batches([batch, batch])
    state, metrics = step(state, stacked, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))
