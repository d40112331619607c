"""Model-level tests: shapes, masking invariance, SE(3) equivariance,
permutation behaviour, loss (mirrors the reference's missing test pyramid —
SURVEY.md section 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.models.loss import (
    diffusion_loss,
    perturb_positions,
    sample_timesteps,
)
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.ops.geometry import eq_transform_dense


@pytest.fixture(scope="module")
def model_and_vars(small_config, tiny_batch):
    model = get_model(small_config)
    variables = model.init(jax.random.PRNGKey(0), tiny_batch, train=False)
    return model, variables


class TestForward:
    def test_shapes_and_finite(self, model_and_vars, tiny_batch):
        model, variables = model_and_vars
        out = model.apply(variables, tiny_batch, train=False)
        b, n = tiny_batch.atom_type.shape
        assert out.edge_inv_global.shape == (b, n, n)
        assert out.edge_inv_local.shape == (b, n, n)
        assert np.isfinite(np.asarray(out.edge_inv_global)).all()
        assert np.isfinite(np.asarray(out.edge_inv_local)).all()
        # local edges are a subset of working-graph edges
        lm = np.asarray(out.local_mask)
        em = np.asarray(out.edge_mask)
        assert (lm <= em).all()

    def test_edge_scores_symmetric(self, model_and_vars, tiny_batch):
        """h_pair is built from h_i*h_j and symmetric edge features, so the
        predicted distance scores must be symmetric (matching the reference's
        duplicated directed edges carrying equal scores)."""
        model, variables = model_and_vars
        out = model.apply(variables, tiny_batch, train=False)
        g = np.asarray(out.edge_inv_global)
        em = np.asarray(out.edge_mask)
        np.testing.assert_allclose(
            np.where(em, g, 0), np.where(em, g.transpose(0, 2, 1), 0), atol=1e-5
        )

    def test_padding_invariance(self, small_config):
        """Extra padding must not change outputs for real nodes."""
        mols = synthetic_dataset(2, seed=3, min_heavy=3, max_heavy=4)
        b16 = pad_molecules(mols, 16, batch_size=2)
        b24 = pad_molecules(mols, 24, batch_size=2)
        model = get_model(small_config)
        variables = model.init(jax.random.PRNGKey(0), b16, train=False)
        out16 = model.apply(variables, b16, train=False)
        out24 = model.apply(variables, b24, train=False)
        n_real = [m.num_nodes for m in mols]
        for g, n in enumerate(n_real):
            a = np.asarray(out16.edge_inv_global)[g, :n, :n]
            bb = np.asarray(out24.edge_inv_global)[g, :n, :n]
            np.testing.assert_allclose(a, bb, atol=2e-4)

    def test_se3_invariance_of_edge_scores(self, model_and_vars, tiny_batch):
        """Distance scores are SE(3)-invariant: rotate+translate input ->
        identical edge scores."""
        model, variables = model_and_vars
        out0 = model.apply(variables, tiny_batch, train=False)
        # random rotation (QR of a Gaussian) + translation
        rng = np.random.default_rng(5)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.normal(size=(3,)) * 2.0
        pos_rot = jnp.einsum("bnc,cd->bnd", tiny_batch.pos, jnp.asarray(q, jnp.float32)) + t
        pos_rot = pos_rot * tiny_batch.node_mask[..., None]
        out1 = model.apply(
            variables, tiny_batch.replace(pos=pos_rot), train=False
        )
        em = np.asarray(out0.edge_mask)
        np.testing.assert_allclose(
            np.where(em, np.asarray(out0.edge_inv_global), 0),
            np.where(em, np.asarray(out1.edge_inv_global), 0),
            atol=3e-4,
        )

    def test_se3_equivariance_of_position_scores(self, model_and_vars, tiny_batch):
        """eq_transform converts invariant edge scores into equivariant
        position scores: rotating the input rotates the output
        (reference geometry.py:9-17)."""
        model, variables = model_and_vars
        out0 = model.apply(variables, tiny_batch, train=False)
        score0 = eq_transform_dense(
            out0.edge_inv_global, tiny_batch.pos, out0.edge_mask, out0.edge_length
        )
        rng = np.random.default_rng(7)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        qj = jnp.asarray(q, jnp.float32)
        pos_rot = jnp.einsum("bnc,cd->bnd", tiny_batch.pos, qj)
        pos_rot = pos_rot * tiny_batch.node_mask[..., None]
        out1 = model.apply(variables, tiny_batch.replace(pos=pos_rot), train=False)
        score1 = eq_transform_dense(
            out1.edge_inv_global, pos_rot, out1.edge_mask, out1.edge_length
        )
        np.testing.assert_allclose(
            np.asarray(score1),
            np.einsum("bnc,cd->bnd", np.asarray(score0), q),
            atol=3e-4,
        )

    def test_tie_edge_encoders_flag(self, small_config, tiny_batch):
        import dataclasses

        untied_cfg = dataclasses.replace(small_config, tie_edge_encoders=False)
        model = get_model(untied_cfg)
        variables = model.init(jax.random.PRNGKey(0), tiny_batch, train=False)
        # untied model has two edge-encoder parameter trees
        names = set(variables["params"].keys())
        assert any("MLPEdgeEncoder_1" in n or "edge" in n.lower() for n in names)
        out = model.apply(variables, tiny_batch, train=False)
        assert np.isfinite(np.asarray(out.edge_inv_local)).all()


class TestLoss:
    def test_antithetic_timesteps(self):
        t = np.asarray(sample_timesteps(jax.random.PRNGKey(0), 8, 100))
        assert t.shape == (8,)
        # mirrored pairs: t[k] + t[k + G//2 + 1] == T - 1 where both halves
        half = 8 // 2 + 1
        full = np.concatenate([t[:half], 99 - t[:half]])[:8]
        np.testing.assert_array_equal(t, full)

    def test_loss_finite_and_positive(self, model_and_vars, tiny_batch, small_config):
        model, variables = model_and_vars
        diff = make_diffusion(small_config)
        key = jax.random.PRNGKey(42)
        tkey, nkey = jax.random.split(key)
        t = sample_timesteps(tkey, tiny_batch.num_graphs, diff.num_timesteps)
        pos_p, a = perturb_positions(
            nkey, tiny_batch, jnp.asarray(diff.alphas), t
        )
        out, _ = model.apply(
            variables, tiny_batch.replace(pos=pos_p), train=True,
            mutable=["batch_stats"],
        )
        lo = diffusion_loss(out, tiny_batch, pos_p, a, small_config.cutoff)
        assert np.isfinite(float(lo.loss))
        assert float(lo.loss) > 0
        assert float(lo.loss_global) >= 0 and float(lo.loss_local) >= 0
        # padded nodes contribute exactly zero
        pn = np.asarray(lo.per_node)
        nm = np.asarray(tiny_batch.node_mask)
        assert (pn[~nm] == 0).all()

    def test_loss_decreases_noise_scale_with_t_zero(
        self, model_and_vars, tiny_batch, small_config
    ):
        """At t=0 (alpha~1) the perturbation is tiny: pos_perturbed ~ pos."""
        model, variables = model_and_vars
        diff = make_diffusion(small_config)
        t = jnp.zeros((tiny_batch.num_graphs,), jnp.int32)
        pos_p, a = perturb_positions(
            jax.random.PRNGKey(1), tiny_batch, jnp.asarray(diff.alphas), t
        )
        delta = np.abs(np.asarray(pos_p - tiny_batch.pos)).max()
        assert delta < 0.1  # beta_start = 1e-7 -> sigma ~ 3e-4


class TestGaussianEdgeEncoder:
    def test_gaussian_encoder_end_to_end(self, tiny_batch):
        """The 'gaussian' edge encoder (broken NameError in the reference,
        edge.py:24) works end-to-end here."""
        import dataclasses

        from agdiff_tpu.config import ModelConfig

        cfg = ModelConfig(
            hidden_dim=32, num_convs=2, num_convs_local=2,
            num_diffusion_timesteps=50, edge_encoder="gaussian",
        )
        model = get_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), tiny_batch, train=False)
        out = model.apply(variables, tiny_batch, train=False)
        assert np.isfinite(np.asarray(out.edge_inv_global)).all()


class TestSmearings:
    def test_sine_cosine_smearings_match_reference_formulas(self):
        """schnet.py:30-68 golden: sin(k*a) ++ cos(l*a) and cos(k*a)."""
        from agdiff_tpu.nn import (
            AsymmetricSineCosineSmearing,
            SymmetricCosineSmearing,
        )

        angle = jnp.asarray(np.linspace(-np.pi, np.pi, 17, dtype=np.float32))
        asym = AsymmetricSineCosineSmearing(num_basis=7)
        out = asym.apply({}, angle)
        assert out.shape == (17, 7)
        a = np.asarray(angle)[:, None]
        golden = np.concatenate(
            [np.sin(a * np.arange(1, 4)), np.cos(a * np.arange(1, 5))],
            axis=-1)
        np.testing.assert_allclose(np.asarray(out), golden, atol=1e-6)
        # 0 and pi must embed differently (the cos half)
        z = np.asarray(asym.apply({}, jnp.asarray([0.0, np.pi])))
        assert np.abs(z[0] - z[1]).max() > 0.5

        sym = SymmetricCosineSmearing(num_basis=5)
        out = sym.apply({}, angle)
        np.testing.assert_allclose(
            np.asarray(out), np.cos(a * np.arange(1, 6)), atol=1e-6)
        # symmetric under angle negation
        np.testing.assert_allclose(
            np.asarray(sym.apply({}, -angle)), np.asarray(out), atol=1e-6)
