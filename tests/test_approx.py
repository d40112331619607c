"""Accuracy bounds of the approximate transcendentals (ops/approx.py) and
the approx serving engines built on them."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agdiff_tpu.ops import approx


def _grid():
    return jnp.asarray(np.linspace(-30, 30, 120001), jnp.float32)


def test_softplus_accuracy():
    x = _grid()
    err = jnp.abs(approx.softplus(x) - jax.nn.softplus(x))
    assert float(err.max()) < 4e-4


def test_tanh_sigmoid_accuracy():
    x = _grid()
    assert float(jnp.abs(approx.tanh(x) - jnp.tanh(x)).max()) < 2e-3
    assert float(
        jnp.abs(approx.sigmoid(x) - jax.nn.sigmoid(x)).max()) < 1e-3
    # saturation exactness: gates must reach exactly 0/1 at the rails
    assert float(approx.sigmoid(jnp.asarray(30.0))) == 1.0
    assert float(approx.sigmoid(jnp.asarray(-30.0))) == 0.0


def test_gelu_accuracy():
    x = _grid()
    err = jnp.abs(approx.gelu(x) - jax.nn.gelu(x, approximate=False))
    assert float(err.max()) < 3e-3


def test_bf16_roundtrip_below_quantization():
    """In bf16, approx == exact after quantization for most inputs; the
    max deviation stays within one bf16 ulp of the exact result."""
    x = jnp.asarray(np.linspace(-12, 12, 20001), jnp.bfloat16)
    # gelu is excluded: the rational-tanh error lands where gelu ~= 0
    # (2e-3 absolute at x ~= -3, huge *relative* to the ~0 exact value);
    # its absolute bound is covered by test_gelu_accuracy
    for fn, ref in [(approx.softplus, jax.nn.softplus),
                    (approx.sigmoid, jax.nn.sigmoid)]:
        a = fn(x).astype(jnp.float32)
        b = ref(x.astype(jnp.float32))
        denom = np.maximum(np.abs(np.asarray(b)), 0.25)
        rel = np.abs(np.asarray(a - b)) / denom
        assert rel.max() < 2.0 ** -7, fn.__name__


@pytest.mark.parametrize("engine", ["approx", "tight-approx"])
def test_approx_engine_sampler_close_to_exact(engine):
    """The approx engines track the exact fast engines through a short
    ladder — per-step score deviation is ~4e-6, so positions stay within
    a loose tolerance over 8 steps. Finite everywhere."""
    from agdiff_tpu.config import ModelConfig
    from agdiff_tpu.data import pad_molecules, synthetic_dataset
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.models.tight_forward import pair_capacity_for
    from agdiff_tpu.sampling import SamplerConfig
    from agdiff_tpu.sampling.langevin import build_fast_sampler

    cfg = ModelConfig(hidden_dim=32, num_convs=2, num_convs_local=2,
                      num_diffusion_timesteps=50)
    mols = synthetic_dataset(1, seed=8, min_heavy=4, max_heavy=4)
    batch = pad_molecules(mols * 4, 16, batch_size=4)
    model = get_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    diffusion = make_diffusion(cfg)
    scfg = SamplerConfig(n_steps=8, w_global=0.3)
    pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)
    exact_name = {"approx": None, "tight-approx": "tight"}[engine]
    cap = (pair_capacity_for(mols[0].num_nodes)
           if engine == "tight-approx" else None)
    kw = dict(use_pallas=False, pair_capacity=cap,
              shared_pairs=engine == "tight-approx")
    r_exact = build_fast_sampler(cfg, variables, diffusion, scfg,
                                 engine=exact_name, **kw)(
        batch, pos_init, jax.random.PRNGKey(2))
    r_apx = build_fast_sampler(cfg, variables, diffusion, scfg,
                               engine=engine, **kw)(
        batch, pos_init, jax.random.PRNGKey(2))
    a, b = np.asarray(r_exact.pos), np.asarray(r_apx.pos)
    assert np.isfinite(b).all()
    assert not np.asarray(r_apx.nan_flags).any()
    np.testing.assert_allclose(a, b, atol=2e-3)
