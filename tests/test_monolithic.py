"""Monolithic per-step kernel vs the module path (interpret mode, f32).

The monolithic kernel (ops/pallas/monolithic.py) must compute the SAME
function as model.apply(train=False): this chains through the fast-forward
equivalence (tests/test_fast_forward.py) down to the torch golden parity
(tests/test_torch_parity.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.ops.pallas import monolithic


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(monolithic, "_INTERPRET", True)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(hidden_dim=32, num_convs=2, num_convs_local=2,
                      num_diffusion_timesteps=50)
    mols = synthetic_dataset(4, seed=9, min_heavy=3, max_heavy=5)
    batch = pad_molecules(mols, 16, edge_order=3, batch_size=4)
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(1), batch, train=False)
    return cfg, batch, model, variables


class TestMonolithicParity:
    def test_matches_module_path_f32(self, setup):
        cfg, batch, model, variables = setup
        fwd = monolithic.build_monolithic_forward(
            cfg, variables, compute_dtype=jnp.float32, tile=2)
        got = fwd(batch, extend_order=False, extend_radius=True)
        ref = model.apply(variables, batch, train=False)
        em, lm = np.asarray(ref.edge_mask), np.asarray(ref.local_mask)
        # only on-mask values are consumed (eq_transform multiplies the mask)
        np.testing.assert_allclose(
            np.where(em, np.asarray(got.edge_inv_global), 0),
            np.where(em, np.asarray(ref.edge_inv_global), 0), atol=2e-4)
        np.testing.assert_allclose(
            np.where(lm, np.asarray(got.edge_inv_local), 0),
            np.where(lm, np.asarray(ref.edge_inv_local), 0), atol=2e-4)
        np.testing.assert_array_equal(np.asarray(got.edge_mask), em)
        np.testing.assert_array_equal(np.asarray(got.local_mask), lm)

    def test_local_only_graph_mode(self, setup):
        """extend_radius=False (bond graph only) must also match."""
        cfg, batch, model, variables = setup
        fwd = monolithic.build_monolithic_forward(
            cfg, variables, compute_dtype=jnp.float32, tile=4)
        got = fwd(batch, extend_order=False, extend_radius=False)
        ref = model.apply(variables, batch, train=False,
                          extend_radius=False)
        em, lm = np.asarray(ref.edge_mask), np.asarray(ref.local_mask)
        np.testing.assert_allclose(
            np.where(em, np.asarray(got.edge_inv_global), 0),
            np.where(em, np.asarray(ref.edge_inv_global), 0), atol=2e-4)
        np.testing.assert_allclose(
            np.where(lm, np.asarray(got.edge_inv_local), 0),
            np.where(lm, np.asarray(ref.edge_inv_local), 0), atol=2e-4)

    def test_non_divisible_batch_falls_back_to_smaller_tile(self, setup):
        cfg, _, model, variables = setup
        mols = synthetic_dataset(3, seed=2, min_heavy=3, max_heavy=4)
        batch3 = pad_molecules(mols, 16, edge_order=3, batch_size=3)
        fwd = monolithic.build_monolithic_forward(
            cfg, variables, compute_dtype=jnp.float32, tile=2)
        got = fwd(batch3)
        ref = model.apply(variables, batch3, train=False)
        em = np.asarray(ref.edge_mask)
        np.testing.assert_allclose(
            np.where(em, np.asarray(got.edge_inv_global), 0),
            np.where(em, np.asarray(ref.edge_inv_global), 0), atol=2e-4)

    def test_bf16_close_to_f32(self, setup):
        cfg, batch, model, variables = setup
        fwd = monolithic.build_monolithic_forward(
            cfg, variables, compute_dtype=jnp.bfloat16, tile=2)
        got = fwd(batch)
        ref = model.apply(variables, batch, train=False)
        em = np.asarray(ref.edge_mask)
        g = np.where(em, np.asarray(got.edge_inv_global), 0)
        r = np.where(em, np.asarray(ref.edge_inv_global), 0)
        scale = np.abs(r).max() + 1e-6
        assert np.abs(g - r).max() / scale < 0.05

    def test_sampler_integration(self, setup):
        """The monolithic forward drives the Langevin scan end to end."""
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig
        from agdiff_tpu.sampling.langevin import langevin_dynamics_sample

        cfg, batch, model, variables = setup
        fwd = monolithic.build_monolithic_forward(
            cfg, variables, compute_dtype=jnp.float32, tile=2)
        scfg = SamplerConfig(n_steps=5, w_global=0.3, clip_local=20.0)
        pos_init = jax.random.normal(jax.random.PRNGKey(3), batch.pos.shape)
        res = langevin_dynamics_sample(
            None, None, batch, pos_init, jax.random.PRNGKey(4),
            make_diffusion(cfg), scfg, forward_fn=fwd)
        assert np.isfinite(np.asarray(res.pos)).all()
