"""FSDP / tensor-parallel training layouts (parallel/sharded.py).

Both must be numerically equivalent to the single-device step — the layouts
only move where tensors live; GSPMD inserts the collectives. Run on the
8-virtual-device CPU mesh from conftest.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from agdiff_tpu.config import Config, ModelConfig, TrainConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.parallel.sharded import (
    make_hybrid_mesh,
    make_sharded_train_step,
    shard_graph_batch_over,
    shard_train_state,
    spec_for_array,
    state_specs,
)
from agdiff_tpu.train.train_step import create_train_state, make_train_step


@pytest.fixture(scope="module")
def cfg():
    return Config(
        model=ModelConfig(hidden_dim=32, num_convs=2, num_convs_local=2,
                          num_diffusion_timesteps=50),
        train=TrainConfig(batch_size=8),
    )


@pytest.fixture(scope="module")
def setup(cfg):
    mols = synthetic_dataset(8, seed=0, min_heavy=3, max_heavy=4)
    batch = pad_molecules(mols, 16, batch_size=8)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), max_nodes=16, batch_size=8
    )
    single = make_train_step(model, cfg, donate=False)
    s1, m1 = single(state, batch, jax.random.PRNGKey(5))
    return model, state, batch, s1, m1


def test_spec_for_array():
    # scalars and small tensors replicate
    assert spec_for_array(jnp.zeros(()), 4, "fsdp") == P()
    assert spec_for_array(jnp.zeros((32,)), 4, "fsdp") == P()
    # large divisible matrices shard on the largest divisible axis
    assert spec_for_array(jnp.zeros((32, 64)), 4, "fsdp") == P(None, "fsdp")
    assert spec_for_array(jnp.zeros((128, 32)), 4, "fsdp") == P("fsdp", None)
    # indivisible large shapes replicate rather than error
    assert spec_for_array(jnp.zeros((33, 65)), 4, "fsdp") == P()


def _assert_state_close(sa, sb):
    """Equivalence that is well-conditioned at Adam step 1.

    The first Adam update is ±lr elementwise regardless of gradient
    magnitude, so for near-zero gradient components a psum-ordering
    rounding difference flips the sign and moves the param by 2·lr —
    params can only be compared to within that bound. The real parallel
    correctness check is the optimizer MOMENTS: mu=(1−β1)g and nu=(1−β2)g²
    mirror the gradients elementwise."""
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(sa.opt_state)),
        jax.tree_util.tree_leaves(jax.device_get(sb.opt_state)),
    ):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-2)
    fa = jax.tree_util.tree_leaves(jax.device_get(sa.params))
    fb = jax.tree_util.tree_leaves(jax.device_get(sb.params))
    assert len(fa) == len(fb)
    for a, b in zip(fa, fb):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=3e-3)


@pytest.mark.parametrize("mode,model_parallel", [("fsdp", 4), ("tp", 4)])
def test_sharded_matches_single_device(setup, cfg, mode, model_parallel):
    model, state, batch, s1, m1 = setup
    mesh = make_hybrid_mesh(8, model_parallel, model_axis=mode)
    axis = mode
    step = make_sharded_train_step(model, cfg, mesh, state, mode=mode)
    sstate = shard_train_state(state, mesh, axis)
    batch_axes = mesh.axis_names if mode == "fsdp" else ("dp",)
    sbatch = shard_graph_batch_over(batch, mesh, batch_axes)
    s2, m2 = step(sstate, sbatch, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1.grad_norm), float(m2.grad_norm), rtol=1e-4
    )
    # the updated parameters and Adam moments must match too (the
    # optimizer genuinely ran on sharded state)
    _assert_state_close(s1, s2)


def test_sharded_state_layout(setup):
    """Sharding actually happened: large params are split over the model
    axis, small ones replicated, and Adam moments follow the param specs."""
    model, state, *_ = setup
    mesh = make_hybrid_mesh(8, 4, model_axis="fsdp")
    sstate = shard_train_state(state, mesh, "fsdp")
    specs = state_specs(state, mesh, "fsdp")

    sharded_leaves = [
        s for s in jax.tree_util.tree_leaves(
            specs, is_leaf=lambda x: isinstance(x, P))
        if s != P()
    ]
    assert sharded_leaves, "nothing got sharded"

    flat, _ = jax.tree_util.tree_flatten(sstate)
    sflat, _ = jax.tree_util.tree_flatten(
        specs, is_leaf=lambda x: isinstance(x, P))
    n_split = 0
    for arr, spec in zip(flat, sflat):
        if not hasattr(arr, "sharding"):
            continue
        if spec == P():
            assert arr.sharding.is_fully_replicated
        else:
            n_split += 1
            shard_shape = arr.sharding.shard_shape(arr.shape)
            assert np.prod(shard_shape) * 4 <= np.prod(arr.shape)
    assert n_split >= 4  # weight matrices AND their mu/nu moments

    # values survive the placement round trip
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(state)),
                    jax.tree_util.tree_leaves(jax.device_get(sstate))):
        np.testing.assert_array_equal(a, b)


def test_hybrid_mesh_validation():
    with pytest.raises(ValueError):
        make_hybrid_mesh(8, 3)
    with pytest.raises(ValueError):
        make_hybrid_mesh(16, 4)
    mesh = make_hybrid_mesh(8, 2, model_axis="tp")
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2


def test_sp_matches_single_device(setup, cfg):
    """Spatial parallelism: node axis sharded over 'sp', params replicated —
    numerically the same step."""
    from agdiff_tpu.parallel.sharded import shard_graph_batch_nodes

    model, state, batch, s1, m1 = setup
    mesh = make_hybrid_mesh(8, 2, model_axis="sp")
    step = make_sharded_train_step(model, cfg, mesh, state, mode="sp")
    sstate = shard_train_state(state, mesh, "dp", min_size=1 << 62)  # repl
    sbatch = shard_graph_batch_nodes(batch, mesh, data_axes=("dp",))

    # the node axis is genuinely split: each shard holds N/2 rows
    assert sbatch.bond_adj.sharding.shard_shape(sbatch.bond_adj.shape) == (
        batch.num_graphs // 4, batch.max_nodes // 2, batch.max_nodes)
    assert sbatch.pos.sharding.shard_shape(sbatch.pos.shape) == (
        batch.num_graphs // 4, batch.max_nodes // 2, 3)

    s2, m2 = step(sstate, sbatch, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    np.testing.assert_allclose(
        float(m1.grad_norm), float(m2.grad_norm), rtol=1e-4
    )
    _assert_state_close(s1, s2)


def test_sp_mode_validation(setup, cfg):
    model, state, *_ = setup
    mesh = make_hybrid_mesh(8, 2, model_axis="tp")
    with pytest.raises(ValueError):
        make_sharded_train_step(model, cfg, mesh, state, mode="sp")
    with pytest.raises(ValueError):
        make_sharded_train_step(model, cfg, mesh, state, mode="pp2")
