"""Pipeline parallelism (parallel/pipeline.py) on the 8-virtual-device CPU
mesh: the GPipe schedule must be numerically identical to the sequential
stack, forward AND backward (grad flows through scan+ppermute), and the
real SchNet interaction stack must pipeline unchanged."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agdiff_tpu.config import Config, ModelConfig
from agdiff_tpu.parallel.pipeline import (
    jit_pipeline,
    make_pp_mesh,
    pipeline_apply,
    schnet_pipeline,
    stack_stage_params,
)


def _toy_setup(S=8, M=4, d=16):
    key = jax.random.PRNGKey(0)
    ws = jax.random.normal(key, (S, d, d)) * 0.3
    x = jax.random.normal(jax.random.PRNGKey(1), (M, 5, d))
    return ws, x


def _stage(w, xm):
    return jnp.tanh(xm @ w)


def _sequential(ws, x):
    for s in range(ws.shape[0]):
        x = _stage(ws[s], x)
    return x


def test_pipeline_matches_sequential():
    mesh = make_pp_mesh(8)
    ws, x = _toy_setup()
    out = pipeline_apply(_stage, ws, x, mesh=mesh)
    np.testing.assert_allclose(out, _sequential(ws, x), rtol=1e-6)


def test_pipeline_gradients_match_sequential():
    """jax.grad through the pipeline == grad of the sequential stack, for
    both the stage parameters and the inputs (pipeline-parallel training)."""
    mesh = make_pp_mesh(8)
    ws, x = _toy_setup()

    def loss_pipe(ws, x):
        return jnp.sum(pipeline_apply(_stage, ws, x, mesh=mesh) ** 2)

    def loss_seq(ws, x):
        return jnp.sum(_sequential(ws, x) ** 2)

    gp_w, gp_x = jax.grad(loss_pipe, argnums=(0, 1))(ws, x)
    gs_w, gs_x = jax.grad(loss_seq, argnums=(0, 1))(ws, x)
    np.testing.assert_allclose(gp_w, gs_w, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(gp_x, gs_x, rtol=1e-5, atol=1e-6)


def test_pipeline_jit_and_placement():
    mesh = make_pp_mesh(8)
    ws, x = _toy_setup()
    run, place = jit_pipeline(_stage, mesh)
    wsp = place(ws)
    # each device holds exactly its stage's slice
    assert wsp.sharding.shard_shape(wsp.shape) == (1, 16, 16)
    out = run(wsp, x)
    np.testing.assert_allclose(out, _sequential(ws, x), rtol=1e-6)


def test_pipeline_pytree_payload():
    """Payloads may be pytrees; passthrough leaves ride with activations."""
    mesh = make_pp_mesh(8)
    ws, x = _toy_setup()
    aux = jnp.arange(x.shape[0], dtype=jnp.float32)[:, None]

    def stage(w, payload):
        xm, a = payload
        return jnp.tanh(xm @ w), a

    out, aux_out = pipeline_apply(stage, ws, (x, aux), mesh=mesh)
    np.testing.assert_allclose(out, _sequential(ws, x), rtol=1e-6)
    np.testing.assert_allclose(aux_out, aux)


def test_pipeline_stage_count_validation():
    mesh = make_pp_mesh(8)
    ws, x = _toy_setup(S=6)
    with pytest.raises(ValueError):
        pipeline_apply(_stage, ws, x, mesh=mesh)


def test_schnet_stack_pipelines(monkeypatch):
    """The real folded SchNet interaction stack (6 blocks, 2 stages of 3)
    produces identical node features pipelined vs sequential."""
    from agdiff_tpu.data.bucketing import pad_molecules
    from agdiff_tpu.data.synthetic import synthetic_dataset
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.fast_forward import build_fast_forward

    cfg = ModelConfig(hidden_dim=16, num_convs=6, num_convs_local=2,
                      num_diffusion_timesteps=50)
    model = get_model(cfg)
    mols = synthetic_dataset(4, seed=0, min_heavy=3, max_heavy=4)
    batch = pad_molecules(mols, 16, batch_size=4)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    fwd = build_fast_forward(cfg, variables, use_pallas=False)

    B, N, F = 4, 16, cfg.hidden_dim
    key = jax.random.PRNGKey(3)
    h = jax.random.normal(key, (B, N, F))
    e = jax.random.normal(jax.random.fold_in(key, 1), (B, N, N, F)) * 0.1
    el = jnp.abs(jax.random.normal(jax.random.fold_in(key, 2),
                                   (B, N, N, 1))) + 0.5
    env = jax.nn.sigmoid(jax.random.normal(jax.random.fold_in(key, 3),
                                           (B, N, N)))

    h_seq = h
    for blk in fwd.schnet_blocks:
        h_seq = fwd.schnet_block(blk, h_seq, e, el, env)

    mesh = make_pp_mesh(2)
    run, stacked = schnet_pipeline(fwd, mesh)
    # microbatch axis = split the batch into 4 microbatches of 1 graph
    mb = lambda a: a[:, None]
    payload = (mb(h), mb(e), mb(el), mb(env))
    h_pipe = run(stacked, payload)[:, 0]
    np.testing.assert_allclose(h_pipe, h_seq, rtol=2e-5, atol=1e-5)
