"""config.packed_pairs: the TRAINING forward over unordered pairs must match
the dense path — values, gradients, and BatchNorm batch statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agdiff_tpu.config import Config, ModelConfig, TrainConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.dualenc import get_model

N_MAX = 24
B = 6


@pytest.fixture(scope="module")
def setup():
    mols = synthetic_dataset(B, seed=3, min_heavy=4, max_heavy=7)
    batch = pad_molecules(mols, max_nodes=N_MAX, edge_order=3, batch_size=B)
    dense_cfg = ModelConfig(hidden_dim=32, num_convs=2, num_convs_local=2,
                            num_diffusion_timesteps=50)
    packed_cfg = dense_cfg.replace(packed_pairs=True) if hasattr(
        dense_cfg, "replace") else None
    if packed_cfg is None:
        import dataclasses

        packed_cfg = dataclasses.replace(dense_cfg, packed_pairs=True)
    dense = get_model(dense_cfg)
    packed = get_model(packed_cfg)
    variables = dense.init(jax.random.PRNGKey(0), batch, train=False)
    return batch, dense_cfg, packed_cfg, dense, packed, variables


def _masked(out):
    em = np.asarray(out.edge_mask)
    lm = np.asarray(out.local_mask)
    return (np.where(em, np.asarray(out.edge_inv_global), 0),
            np.where(lm, np.asarray(out.edge_inv_local), 0))


def test_packed_forward_matches_dense_eval(setup):
    batch, _, _, dense, packed, variables = setup
    a = dense.apply(variables, batch, train=False)
    b = packed.apply(variables, batch, train=False)
    ga, la = _masked(a)
    gb, lb = _masked(b)
    np.testing.assert_allclose(gb, ga, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(lb, la, rtol=2e-5, atol=2e-5)


def test_packed_train_mode_matches_dense_incl_batch_stats(setup):
    batch, _, _, dense, packed, variables = setup
    a, va = dense.apply(variables, batch, train=True,
                        mutable=["batch_stats"])
    b, vb = packed.apply(variables, batch, train=True,
                         mutable=["batch_stats"])
    ga, la = _masked(a)
    gb, lb = _masked(b)
    np.testing.assert_allclose(gb, ga, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(lb, la, rtol=2e-5, atol=2e-5)
    flat_a = jax.tree_util.tree_leaves_with_path(va["batch_stats"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(vb["batch_stats"]))
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_b[path]), np.asarray(leaf),
            rtol=1e-5, atol=1e-6, err_msg=str(path))


def test_packed_gradients_match_dense(setup):
    batch, dense_cfg, packed_cfg, dense, packed, variables = setup
    from agdiff_tpu.models.loss import diffusion_loss, perturb_positions, \
        sample_timesteps
    from agdiff_tpu.models.schedules import make_diffusion

    diffusion = make_diffusion(dense_cfg)
    alphas = jnp.asarray(diffusion.alphas)
    key = jax.random.PRNGKey(5)
    tkey, nkey = jax.random.split(key)
    t = sample_timesteps(tkey, batch.num_graphs, diffusion.num_timesteps)
    pos_p, a_t = perturb_positions(nkey, batch, alphas, t)
    nb = batch.replace(pos=pos_p)

    def loss_of(model):
        def f(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                nb, train=True, mutable=["batch_stats"])
            return diffusion_loss(out, batch, pos_p, a_t,
                                  dense_cfg.cutoff).loss
        return f

    la, ga = jax.value_and_grad(loss_of(dense))(variables["params"])
    lb, gb = jax.value_and_grad(loss_of(packed))(variables["params"])
    np.testing.assert_allclose(float(lb), float(la), rtol=1e-5)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(gb))
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(flat_b[path]), np.asarray(leaf),
            rtol=5e-4, atol=5e-5, err_msg=str(path))


def test_packed_with_remat_matches_dense(setup):
    """packed_pairs composes with remat (the pairs tuple rides through
    nn.remat as a regular pytree argument)."""
    import dataclasses

    batch, dense_cfg, _, dense, _, variables = setup
    cfg_pr = dataclasses.replace(dense_cfg, packed_pairs=True, remat=True)
    both = get_model(cfg_pr)
    a = dense.apply(variables, batch, train=False)
    b = both.apply(variables, batch, train=False)
    ga, la = _masked(a)
    gb, lb = _masked(b)
    np.testing.assert_allclose(gb, ga, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(lb, la, rtol=2e-5, atol=2e-5)


def test_packed_train_step_runs(setup):
    """End-to-end: a train step with packed_pairs updates parameters and the
    loss is finite and equal to the dense step's loss."""
    batch, dense_cfg, packed_cfg, _, _, _ = setup
    from agdiff_tpu.train.train_step import create_train_state, make_train_step

    results = {}
    for name, mc in (("dense", dense_cfg), ("packed", packed_cfg)):
        cfg = Config(model=mc, train=TrainConfig(batch_size=B))
        model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                          max_nodes=N_MAX, batch_size=B)
        step = make_train_step(model, cfg, donate=False)
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        results[name] = float(metrics.loss)
    assert np.isfinite(results["packed"])
    np.testing.assert_allclose(results["packed"], results["dense"],
                               rtol=1e-4)
