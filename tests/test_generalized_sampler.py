"""The 'generalized' (DDIM) sampling extension.

The reference accepts sampling_type/eta and ignores them
(/root/reference/src/agdiff/models/epsnet/dualenc.py:437-439 threads the
kwargs; 462-546 never reads them). Here 'generalized' is a real DDIM update
in the model's scaled parameterization (sampling/langevin.py docstring):

    pos' = pos + (sqrt(sigma_j^2 - s^2) - sigma_i) * eps_hat + s * z
    s    = eta * sigma_j * sqrt(1 - a_i/a_j) / sqrt(1 - a_i)

These tests check the update math analytically against a hand-computed
trajectory (constant injected edge scores), the eta=0 determinism property,
and end-to-end smoke on the real model incl. the fast engines.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agdiff_tpu import Config, ModelConfig, TrainConfig
from agdiff_tpu.data import synthetic_dataset
from agdiff_tpu.data.bucketing import repeat_molecule
from agdiff_tpu.models.dualenc import ModelOutput, get_model
from agdiff_tpu.models.schedules import make_diffusion
from agdiff_tpu.ops.geometry import center_pos, clip_norm, eq_transform_dense, \
    pairwise_distance
from agdiff_tpu.sampling import SamplerConfig, build_sampler
from agdiff_tpu.sampling.langevin import langevin_dynamics_sample


@pytest.fixture
def smoke_config():
    return Config(
        model=ModelConfig(
            hidden_dim=32, num_convs=2, num_convs_local=2,
            num_diffusion_timesteps=100,
        ),
        train=TrainConfig(batch_size=8),
    )


def _const_forward(edge_inv_g, edge_inv_l, edge_mask, local_mask):
    """A forward_fn returning fixed edge scores; edge_length tracks pos."""

    def forward(batch, **kwargs):
        return ModelOutput(
            edge_inv_global=edge_inv_g,
            edge_inv_local=edge_inv_l,
            edge_mask=edge_mask,
            edge_type=jnp.zeros(edge_mask.shape, jnp.int32),
            edge_length=pairwise_distance(batch.pos),
            local_mask=local_mask,
        )

    return forward


class TestDDIMMath:
    def _setup(self):
        mol = synthetic_dataset(1, seed=0, min_heavy=3, max_heavy=3)[0]
        batch = repeat_molecule(mol, 2, max_nodes=12)
        cfg = ModelConfig(num_diffusion_timesteps=50)
        diffusion = make_diffusion(cfg)
        B, N = batch.num_graphs, batch.node_mask.shape[1]
        nm = np.asarray(batch.node_mask)
        em = nm[:, :, None] & nm[:, None, :] & ~np.eye(N, dtype=bool)
        rng = np.random.default_rng(3)
        inv_g = jnp.asarray(rng.normal(size=(B, N, N)) * em * 0.1,
                            jnp.float32)
        lm = jnp.asarray((np.asarray(batch.bond_adj) > 0) & em)
        inv_l = jnp.asarray(rng.normal(size=(B, N, N)) * em * 0.1,
                            jnp.float32)
        return batch, diffusion, inv_g, inv_l, jnp.asarray(em), lm

    def _eps_pos(self, out_g, out_l, pos, em, lm, scfg, sigma_i):
        d = pairwise_distance(pos)
        eq_l = eq_transform_dense(out_l, pos, lm, d)
        inv_g = out_g * (1.0 - lm.astype(jnp.float32))
        eq_g = clip_norm(eq_transform_dense(inv_g, pos, em, d), scfg.clip)
        eq_g = jnp.where(sigma_i < scfg.global_start_sigma, eq_g, 0.0)
        return eq_l + eq_g * scfg.w_global

    def test_single_step_is_x0_prediction(self):
        """n_steps=1: j=-1 so sigma_j=0 and the update must land on the
        x0-prediction pos + sigma_i * eps_pos (then CoM-centered)."""
        batch, diffusion, inv_g, inv_l, em, lm = self._setup()
        scfg = SamplerConfig(n_steps=1, sampling_type="generalized",
                             eta=1.0, global_start_sigma=float("inf"))
        fwd = _const_forward(inv_g, inv_l, em, lm)
        key = jax.random.PRNGKey(5)
        pos_init = jax.random.normal(jax.random.PRNGKey(6), batch.pos.shape)
        res = langevin_dynamics_sample(None, None, batch, pos_init, key,
                                       diffusion, scfg, forward_fn=fwd)
        sigmas = jnp.asarray(diffusion.sigmas)
        sig_T = sigmas[-1]
        pos0 = pos_init * sig_T * batch.node_mask[..., None]
        eps_pos = self._eps_pos(inv_g, inv_l, pos0, em, lm, scfg, sig_T)
        expect = center_pos(pos0 + sig_T * eps_pos, batch.node_mask)
        np.testing.assert_allclose(np.asarray(res.pos), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)

    def test_two_step_eta0_trajectory(self):
        """n_steps=2 strided, eta=0: hand-computed deterministic DDIM
        trajectory pos' = pos - (sigma_j - sigma_i) * eps_pos."""
        batch, diffusion, inv_g, inv_l, em, lm = self._setup()
        scfg = SamplerConfig(n_steps=2, ladder="strided",
                             sampling_type="generalized", eta=0.0,
                             global_start_sigma=float("inf"))
        fwd = _const_forward(inv_g, inv_l, em, lm)
        key = jax.random.PRNGKey(5)
        pos_init = jax.random.normal(jax.random.PRNGKey(6), batch.pos.shape)
        res = langevin_dynamics_sample(None, None, batch, pos_init, key,
                                       diffusion, scfg, forward_fn=fwd)
        sigmas = jnp.asarray(diffusion.sigmas)
        T = diffusion.num_timesteps
        nm3 = batch.node_mask[..., None]
        pos = pos_init * sigmas[T - 1] * nm3
        # step 1: i=T-1 -> j=0 (strided over the full ladder)
        eps = self._eps_pos(inv_g, inv_l, pos, em, lm, scfg, sigmas[T - 1])
        pos = pos + (sigmas[0] - sigmas[T - 1]) * (-eps)
        pos = center_pos(pos, batch.node_mask)
        # step 2: i=0 -> j=-1 (sigma_j = 0)
        eps = self._eps_pos(inv_g, inv_l, pos, em, lm, scfg, sigmas[0])
        pos = pos + (0.0 - sigmas[0]) * (-eps)
        pos = center_pos(pos, batch.node_mask)
        np.testing.assert_allclose(np.asarray(res.pos), np.asarray(pos),
                                   rtol=1e-5, atol=1e-5)

    def test_eta0_key_independent(self):
        """eta=0 is deterministic: different PRNG keys, same output."""
        batch, diffusion, inv_g, inv_l, em, lm = self._setup()
        scfg = SamplerConfig(n_steps=8, ladder="strided",
                             sampling_type="generalized", eta=0.0)
        fwd = _const_forward(inv_g, inv_l, em, lm)
        pos_init = jax.random.normal(jax.random.PRNGKey(6), batch.pos.shape)
        a = langevin_dynamics_sample(None, None, batch, pos_init,
                                     jax.random.PRNGKey(1), diffusion, scfg,
                                     forward_fn=fwd)
        b = langevin_dynamics_sample(None, None, batch, pos_init,
                                     jax.random.PRNGKey(2), diffusion, scfg,
                                     forward_fn=fwd)
        np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))

    def test_noise_magnitude_eta1(self):
        """eta=1, zero scores: each step adds exactly s^2 variance, so the
        accumulated per-coordinate variance is sigma_T^2 + sum s_k^2
        (before centering removes the 3 CoM modes per graph)."""
        batch, diffusion, inv_g, inv_l, em, lm = self._setup()
        zeros = jnp.zeros_like(inv_g)
        scfg = SamplerConfig(n_steps=10, ladder="strided",
                             sampling_type="generalized", eta=1.0)
        fwd = _const_forward(zeros, zeros, em, lm)
        sigmas = np.asarray(diffusion.sigmas, np.float64)
        alphas = np.asarray(diffusion.alphas, np.float64)
        T = diffusion.num_timesteps
        idx = np.round(np.linspace(T - 1, 0, 10)).astype(int)
        nxt = list(idx[1:]) + [-1]
        var = sigmas[idx[0]] ** 2
        for i, j in zip(idx, nxt):
            a_i, a_j = alphas[i], (alphas[j] if j >= 0 else 1.0)
            sig2_j = sigmas[j] ** 2 if j >= 0 else 0.0
            var = var + sig2_j * (1 - a_i / a_j) / (1 - a_i)
        # with zero scores the (c_eps - sigma_i) drift term vanishes, so
        # positions are a pure sum of independent noises
        samples = []
        n = int(np.asarray(batch.node_mask)[0].sum())
        for k in range(64):
            pos_init = jax.random.normal(jax.random.PRNGKey(100 + k),
                                         batch.pos.shape)
            r = langevin_dynamics_sample(None, None, batch, pos_init,
                                         jax.random.PRNGKey(k), diffusion,
                                         scfg, forward_fn=fwd)
            samples.append(np.asarray(r.pos)[:, :n])
        s = np.stack(samples)  # (K, B, n, 3)
        # centering removes 1/n of the variance per coordinate
        expect = var * (1.0 - 1.0 / n)
        got = s.var()
        assert abs(got - expect) / expect < 0.15, (got, expect)


class TestHeun:
    def test_two_step_trajectory(self):
        """n_steps=2 strided heun: hand-computed predictor-corrector
        trajectory (final sigma_j=0 step stays Euler)."""
        t = TestDDIMMath()
        batch, diffusion, inv_g, inv_l, em, lm = t._setup()
        scfg = SamplerConfig(n_steps=2, ladder="strided",
                             sampling_type="generalized", eta=0.0,
                             solver="heun", global_start_sigma=float("inf"))
        fwd = _const_forward(inv_g, inv_l, em, lm)
        pos_init = jax.random.normal(jax.random.PRNGKey(6), batch.pos.shape)
        res = langevin_dynamics_sample(None, None, batch, pos_init,
                                       jax.random.PRNGKey(5), diffusion,
                                       scfg, forward_fn=fwd)
        sigmas = jnp.asarray(diffusion.sigmas)
        T = diffusion.num_timesteps
        nm3 = batch.node_mask[..., None]
        eps = lambda p, s: -t._eps_pos(inv_g, inv_l, p, em, lm, scfg, s)
        pos = pos_init * sigmas[T - 1] * nm3
        # step 1: i=T-1 -> j=0, heun
        h = sigmas[0] - sigmas[T - 1]
        d1 = eps(pos, sigmas[T - 1])
        d2 = eps(pos + h * d1, sigmas[0])
        pos = center_pos(pos + h * 0.5 * (d1 + d2), batch.node_mask)
        # step 2: i=0 -> j=-1 (sigma_j=0): Euler
        pos = center_pos(pos + (0.0 - sigmas[0]) * eps(pos, sigmas[0]),
                         batch.node_mask)
        np.testing.assert_allclose(np.asarray(res.pos), np.asarray(pos),
                                   rtol=1e-5, atol=1e-5)

    def test_heun_requires_eta0(self):
        t = TestDDIMMath()
        batch, diffusion, inv_g, inv_l, em, lm = t._setup()
        scfg = SamplerConfig(n_steps=4, sampling_type="generalized",
                             eta=0.5, solver="heun")
        with pytest.raises(ValueError, match="eta=0"):
            langevin_dynamics_sample(
                None, None, batch, jnp.zeros(batch.pos.shape),
                jax.random.PRNGKey(0), diffusion, scfg,
                forward_fn=_const_forward(inv_g, inv_l, em, lm))

    def test_smoke_real_model(self, smoke_config):
        mol = synthetic_dataset(1, seed=2, min_heavy=3, max_heavy=3)[0]
        batch = repeat_molecule(mol, 2, max_nodes=16)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=6, ladder="strided",
                             sampling_type="generalized", eta=0.0,
                             solver="heun", w_global=0.3)
        res = build_sampler(model, diffusion, scfg)(
            variables, batch,
            jax.random.normal(jax.random.PRNGKey(3), batch.pos.shape),
            jax.random.PRNGKey(4))
        assert np.isfinite(np.asarray(res.pos)).all()
        assert not np.asarray(res.nan_flags).any()


class TestGeneralizedEndToEnd:
    def test_smoke_real_model(self, smoke_config):
        mol = synthetic_dataset(1, seed=2, min_heavy=3, max_heavy=3)[0]
        batch = repeat_molecule(mol, 4, max_nodes=16)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=10, ladder="strided",
                             sampling_type="generalized", eta=1.0,
                             w_global=0.3)
        sampler = build_sampler(model, diffusion, scfg)
        pos_init = jax.random.normal(jax.random.PRNGKey(3), batch.pos.shape)
        res = sampler(variables, batch, pos_init, jax.random.PRNGKey(4))
        pos = np.asarray(res.pos)
        assert np.isfinite(pos).all()
        assert not np.asarray(res.nan_flags).any()
        n = mol.num_nodes
        np.testing.assert_allclose(pos[:, :n].mean(axis=1), 0.0, atol=1e-4)

    def test_fast_engine_matches_module_path(self, smoke_config):
        """generalized + fast-xla engine == generalized + module path."""
        from agdiff_tpu.sampling.langevin import build_fast_sampler

        mol = synthetic_dataset(1, seed=2, min_heavy=3, max_heavy=3)[0]
        batch = repeat_molecule(mol, 2, max_nodes=16)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=6, ladder="strided",
                             sampling_type="generalized", eta=1.0,
                             w_global=0.3)
        pos_init = jax.random.normal(jax.random.PRNGKey(3), batch.pos.shape)
        key = jax.random.PRNGKey(4)
        ref = build_sampler(model, diffusion, scfg)(
            variables, batch, pos_init, key)
        fast = build_fast_sampler(smoke_config.model, variables, diffusion,
                                  scfg, use_pallas=False)(
            batch, pos_init, key)
        np.testing.assert_allclose(np.asarray(fast.pos), np.asarray(ref.pos),
                                   rtol=2e-4, atol=2e-4)

    def test_bad_sampling_type_raises(self, smoke_config):
        mol = synthetic_dataset(1, seed=2, min_heavy=3, max_heavy=3)[0]
        batch = repeat_molecule(mol, 2, max_nodes=16)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=4, sampling_type="ddim")
        with pytest.raises(ValueError, match="sampling_type"):
            langevin_dynamics_sample(
                model, variables, batch,
                jnp.zeros(batch.pos.shape), jax.random.PRNGKey(0),
                diffusion, scfg)
