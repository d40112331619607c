"""Fused-init dispatch: the ladder program that draws its own init noise
(one remote dispatch per chunk instead of normal()/ladder/fetch round
trips, each ~25 ms through the axon tunnel) must be value-identical to the
legacy path that generates pos_init eagerly and passes the tensor in —
jax.random.normal(key, shape) traces to the same computation either way."""

import jax
import numpy as np
import pytest

from agdiff_tpu import Config, ModelConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.eval.generate import (
    GenerationRunner,
    PackedGenerationRunner,
    _host_keys,
)
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.sampling import SamplerConfig


@pytest.fixture(scope="module")
def bundle():
    cfg = Config(model=ModelConfig(hidden_dim=32, num_convs=2,
                                   num_convs_local=2,
                                   num_diffusion_timesteps=50))
    mols = synthetic_dataset(3, seed=11, min_heavy=3, max_heavy=4,
                             num_conformers=2)
    batch = pad_molecules(mols[:1], 16, batch_size=1)
    model = get_model(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    return cfg, model, variables, mols


def _make_runner(bundle, cls, use_fast):
    cfg, model, variables, _ = bundle
    return cls(
        model, variables, make_diffusion(cfg.model),
        SamplerConfig(n_steps=5), buckets=(16,), chunk_size=4,
        use_fast=use_fast, model_config=cfg.model,
    )


def _unfuse(runner):
    """Force the legacy eager-pos_init dispatch on a runner."""
    orig = runner._sampler

    def patched(*a, **k):
        h = orig(*a, **k)
        h.fused = False
        return h

    runner._sampler = patched
    return runner


@pytest.mark.parametrize("use_fast", [False, True])
def test_fused_matches_legacy_base_runner(bundle, use_fast):
    _, _, _, mols = bundle
    key = _host_keys(lambda: jax.random.PRNGKey(3))
    fused = _make_runner(bundle, GenerationRunner, use_fast)
    legacy = _unfuse(_make_runner(bundle, GenerationRunner, use_fast))
    a = fused.generate_molecule(mols[0], 6, key)   # 2 chunks (4 + 2)
    b = legacy.generate_molecule(mols[0], 6, key)
    assert a.shape == b.shape == (6, mols[0].num_nodes, 3)
    np.testing.assert_allclose(a, b, atol=1e-6)
    # at least one fused handle actually exists on the fused runner
    assert any(h.fused for h in fused._samplers.values())


def test_fused_matches_legacy_packed_runner(bundle, tmp_path):
    _, _, _, mols = bundle
    fused = _make_runner(bundle, PackedGenerationRunner, True)
    legacy = _unfuse(_make_runner(bundle, PackedGenerationRunner, True))
    a = fused.run(mols, str(tmp_path / "a"), seed=5, num_confs=3,
                  save=False)
    b = legacy.run(mols, str(tmp_path / "b"), seed=5, num_confs=3,
                   save=False)
    assert len(a) == len(b) == len(mols)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x.meta["pos_gen"], y.meta["pos_gen"],
                                   atol=1e-6)
    # save=False wrote nothing
    assert not (tmp_path / "a").exists()
    assert not (tmp_path / "b").exists()


def test_warm_all_sizes_covers_merge_shapes(bundle):
    """warm(all_sizes=True) compiles EVERY batch size _batch_size_for can
    emit (powers of two 8..chunk_size) so a dynamically-batched merge
    never hits a cold program mid-request."""
    cfg, model, variables, mols = bundle
    runner = PackedGenerationRunner(
        model, variables, make_diffusion(cfg.model),
        SamplerConfig(n_steps=5), buckets=(16,), chunk_size=16,
        use_fast=True, model_config=cfg.model,
    )
    compiled = runner.warm(mols[0], num_samples=4, all_sizes=True)
    sizes = sorted(b for _, b, _ in compiled)
    assert sizes == [8, 16], sizes
    # idempotent: nothing new on a second call
    assert runner.warm(mols[0], num_samples=4, all_sizes=True) == []


def test_warm_compiles_fused_program(bundle):
    _, _, variables, mols = bundle
    runner = _make_runner(bundle, GenerationRunner, True)
    compiled = runner.warm(mols[0], num_samples=4)
    assert compiled  # newly compiled
    handle = next(iter(runner._samplers.values()))
    assert handle.fused
    fused_sigs = [s for s in handle.compiled if s[-1] in (False, True)]
    assert fused_sigs
    # sampling after warm goes through the AOT executable and matches jit
    key = _host_keys(lambda: jax.random.PRNGKey(7))
    a = runner.generate_molecule(mols[0], 4, key)
    fresh = _make_runner(bundle, GenerationRunner, True)
    b = fresh.generate_molecule(mols[0], 4, key)
    np.testing.assert_allclose(a, b, atol=1e-6)
