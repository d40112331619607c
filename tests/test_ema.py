"""EMA shadow weights (config.train.ema_decay — an extension; the reference
trains/evals raw weights only, scripts/train.py:117-158)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agdiff_tpu import Config, ModelConfig, TrainConfig
from agdiff_tpu.data import synthetic_dataset, pad_molecules
from agdiff_tpu.train.train_step import (
    create_train_state,
    make_chunked_train_step,
    make_train_step,
    stack_batches,
)


def _setup(ema_decay):
    cfg = Config(
        model=ModelConfig(hidden_dim=16, num_convs=2, num_convs_local=1,
                          num_diffusion_timesteps=20),
        train=TrainConfig(batch_size=4, ema_decay=ema_decay),
    )
    mols = synthetic_dataset(4, seed=0, min_heavy=3, max_heavy=4)
    batch = pad_molecules(mols, max_nodes=16, edge_order=3, batch_size=4)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), 16, 4)
    return cfg, model, state, batch


def test_ema_matches_manual_recursion():
    d = 0.5
    cfg, model, state, batch = _setup(d)
    step = make_train_step(model, cfg, donate=False)
    expect = state.params
    for i in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(i + 1))
        expect = jax.tree_util.tree_map(
            lambda e, p: d * e + (1 - d) * p, expect, state.params)
    for got, want in zip(jax.tree_util.tree_leaves(state.ema_params),
                         jax.tree_util.tree_leaves(expect)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
    # the shadow trails the raw weights (some leaves are dead params with
    # zero grads — equal there — but the trained ones must differ)
    assert any(
        not np.allclose(np.asarray(p), np.asarray(e))
        for p, e in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(state.ema_params))
    )


def test_ema_off_is_none_and_chunked_matches_single():
    cfg, model, state, batch = _setup(0.0)
    assert state.ema_params is None
    step = make_train_step(model, cfg, donate=False)
    s1, _ = step(state, batch, jax.random.PRNGKey(1))
    assert s1.ema_params is None

    # chunked path carries the shadow identically when it IS on
    cfg2, model2, state2, batch2 = _setup(0.9)
    step2 = make_train_step(model2, cfg2, donate=False)
    ref = state2
    keys = [jax.random.PRNGKey(11), jax.random.PRNGKey(12)]
    k0 = jax.random.PRNGKey(7)
    keys = list(jax.random.split(k0, 2))
    for k in keys:
        ref, _ = step2(ref, batch2, k)
    chunked = make_chunked_train_step(model2, cfg2, 2, donate=False)
    got, _ = chunked(state2, stack_batches([batch2, batch2]), k0)
    for a, b in zip(jax.tree_util.tree_leaves(got.ema_params),
                    jax.tree_util.tree_leaves(ref.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_checkpoint_roundtrip(tmp_path):
    from agdiff_tpu.cli._common import load_inference_bundle
    from agdiff_tpu.train.checkpoint import save_checkpoint
    from agdiff_tpu.train.optimizer import plateau_init

    cfg, model, state, batch = _setup(0.8)
    step = make_train_step(model, cfg, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    log_dir = str(tmp_path / "run")
    pl = plateau_init(1e-3)
    save_checkpoint(log_dir, 1, cfg, state, pl, pl, 1.0, best=True)

    path = os.path.join(log_dir, "checkpoints", "1")
    _, variables, _, _ = load_inference_bundle(path, use_ema=True)
    for got, want in zip(jax.tree_util.tree_leaves(variables["params"]),
                         jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # raw weights by default
    _, raw, _, _ = load_inference_bundle(path)
    for got, want in zip(jax.tree_util.tree_leaves(raw["params"]),
                         jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_use_ema_without_shadow_raises(tmp_path):
    from agdiff_tpu.cli._common import load_inference_bundle
    from agdiff_tpu.train.checkpoint import save_checkpoint
    from agdiff_tpu.train.optimizer import plateau_init

    cfg, model, state, batch = _setup(0.0)
    log_dir = str(tmp_path / "run")
    pl = plateau_init(1e-3)
    save_checkpoint(log_dir, 1, cfg, state, pl, pl, 1.0)
    with pytest.raises(ValueError, match="ema"):
        load_inference_bundle(os.path.join(log_dir, "checkpoints", "1"),
                              use_ema=True)


def test_ema_resume_roundtrip(tmp_path):
    """Trainer.resume restores the shadow (and the DP replicated-state path
    accepts the extra leaf via the broadcast sharding)."""
    from agdiff_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )
    from agdiff_tpu.train.optimizer import plateau_init

    cfg, model, state, batch = _setup(0.9)
    step = make_train_step(model, cfg, donate=False)
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    log_dir = str(tmp_path / "run")
    pl = plateau_init(1e-3)
    save_checkpoint(log_dir, 1, cfg, state, pl, pl, 2.5)
    path, it = latest_checkpoint(log_dir)
    assert it == 1
    ckpt = load_checkpoint(path, target=state)
    for a, b in zip(jax.tree_util.tree_leaves(ckpt["ema_params"]),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
