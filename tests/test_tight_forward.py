"""Equivalence of the tight-pair inference engine (models/tight_forward.py)
with the flax module path, on mixed-size batches where tight capacity
actually bites (pads > real pairs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from agdiff_tpu.config import ModelConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.models.tight_forward import (
    build_tight_forward,
    pair_capacity_for,
    prepare_pairs,
)

N_MAX = 24


@pytest.fixture(scope="module")
def setup():
    config = ModelConfig(hidden_dim=32, num_convs=3, num_convs_local=2,
                         num_diffusion_timesteps=50)
    # mixed sizes: real pair counts differ per graph
    mols = synthetic_dataset(6, seed=3, min_heavy=4, max_heavy=7)
    batch = pad_molecules(mols, max_nodes=N_MAX, edge_order=3, batch_size=6)
    model = get_model(config)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    ref = model.apply(variables, batch, train=False)
    return config, batch, variables, ref, mols


def test_prepare_pairs_enumerates_exactly_the_real_pairs(setup):
    _, batch, _, _, _ = setup
    nm = np.asarray(batch.node_mask)
    cap = N_MAX * (N_MAX - 1) // 2
    pk = prepare_pairs(batch.node_mask, cap)
    valid = np.asarray(pk.valid)
    idx = np.asarray(pk.idx)
    for b in range(nm.shape[0]):
        n_real = int(nm[b].sum())
        want = n_real * (n_real - 1) // 2
        assert int(valid[b].sum()) == want
        iu, ju = idx[b] // N_MAX, idx[b] % N_MAX
        real = valid[b] > 0
        assert np.all(iu[real] < ju[real])
        assert np.all(nm[b][iu[real]]) and np.all(nm[b][ju[real]])
        # row-major order preserved (stable sort)
        flat = idx[b][real]
        assert np.all(np.diff(flat) > 0)


@pytest.mark.parametrize("capacity", [None, "tight"])
def test_tight_forward_matches_module(setup, capacity):
    config, batch, variables, ref, mols = setup
    if capacity == "tight":
        capacity = pair_capacity_for(max(len(m.atom_type) for m in mols))
        assert capacity < N_MAX * (N_MAX - 1) // 2  # tight actually bites
    fwd = build_tight_forward(config, variables, capacity=capacity)
    out = jax.jit(lambda b: fwd(b))(batch)
    # module-path planes are unmasked; compare under the masks (the sampler
    # only ever consumes masked values) — same convention as
    # tests/test_fast_forward.py
    em = np.asarray(ref.edge_mask)
    lm = np.asarray(ref.local_mask)
    np.testing.assert_allclose(
        np.where(em, np.asarray(out.edge_inv_global), 0),
        np.where(em, np.asarray(ref.edge_inv_global), 0),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.where(lm, np.asarray(out.edge_inv_local), 0),
        np.where(lm, np.asarray(ref.edge_inv_local), 0),
        rtol=2e-4, atol=2e-4)
    assert np.array_equal(np.asarray(out.edge_mask),
                          np.asarray(ref.edge_mask))
    assert np.array_equal(np.asarray(out.local_mask),
                          np.asarray(ref.local_mask))


def test_tight_forward_bf16_close(setup):
    config, batch, variables, ref, mols = setup
    cap = pair_capacity_for(max(len(m.atom_type) for m in mols))
    fwd = build_tight_forward(config, variables, compute_dtype=jnp.bfloat16,
                              capacity=cap)
    out = jax.jit(lambda b: fwd(b))(batch)
    em = np.asarray(ref.edge_mask)
    g = np.where(em, np.asarray(out.edge_inv_global), 0)
    rg = np.where(em, np.asarray(ref.edge_inv_global), 0)
    denom = np.abs(rg).max() + 1e-6
    assert np.abs(g - rg).max() / denom < 0.05


def test_tight_slim_storage_close_to_module(setup):
    """store_dtype=bfloat16 on the tight engine (engine 'tight-slim'):
    narrows the GIN message tensors and the pair-score chains. Same
    quality bar as the fast path's slim test (tests/test_fast_forward.py)
    — 5% relative under the masks; the quality gate proper is the paired
    protocol eval."""
    config, batch, variables, ref, mols = setup
    cap = pair_capacity_for(max(len(m.atom_type) for m in mols))
    fwd = build_tight_forward(config, variables,
                              compute_dtype=jnp.bfloat16, capacity=cap,
                              store_dtype=jnp.bfloat16)
    out = jax.jit(lambda b: fwd(b))(batch)
    em, lm = np.asarray(ref.edge_mask), np.asarray(ref.local_mask)
    g = np.where(em, np.asarray(out.edge_inv_global), 0)
    rg = np.where(em, np.asarray(ref.edge_inv_global), 0)
    assert np.abs(g - rg).max() / (np.abs(rg).max() + 1e-6) < 0.05
    li = np.where(lm, np.asarray(out.edge_inv_local), 0)
    rl = np.where(lm, np.asarray(ref.edge_inv_local), 0)
    assert np.abs(li - rl).max() / (np.abs(rl).max() + 1e-6) < 0.05


def test_tight_edge_dtype_close_to_module(setup):
    """edge_dtype=bfloat16 on the tight engine (engine suffix '-e16'):
    narrows the edge-encoder chain like fast_forward's. Same 5% bar."""
    config, batch, variables, ref, mols = setup
    cap = pair_capacity_for(max(len(m.atom_type) for m in mols))
    fwd = build_tight_forward(config, variables,
                              compute_dtype=jnp.bfloat16, capacity=cap,
                              store_dtype=jnp.bfloat16,
                              edge_dtype=jnp.bfloat16)
    out = jax.jit(lambda b: fwd(b))(batch)
    em, lm = np.asarray(ref.edge_mask), np.asarray(ref.local_mask)
    g = np.where(em, np.asarray(out.edge_inv_global), 0)
    rg = np.where(em, np.asarray(ref.edge_inv_global), 0)
    assert np.abs(g - rg).max() / (np.abs(rg).max() + 1e-6) < 0.05
    li = np.where(lm, np.asarray(out.edge_inv_local), 0)
    rl = np.where(lm, np.asarray(ref.edge_inv_local), 0)
    assert np.abs(li - rl).max() / (np.abs(rl).max() + 1e-6) < 0.05


def test_tight_slim8_finite_and_correlated(setup):
    """store_dtype=float8_e4m3fn on the tight engine: scores must stay
    finite and strongly correlated with the module's (fp8 has ~6% max
    per-element quantization error)."""
    config, batch, variables, ref, mols = setup
    cap = pair_capacity_for(max(len(m.atom_type) for m in mols))
    fwd = build_tight_forward(config, variables,
                              compute_dtype=jnp.bfloat16, capacity=cap,
                              store_dtype=jnp.float8_e4m3fn)
    out = jax.jit(lambda b: fwd(b))(batch)
    for plane, refplane, mask in (
            (out.edge_inv_global, ref.edge_inv_global, ref.edge_mask),
            (out.edge_inv_local, ref.edge_inv_local, ref.local_mask)):
        m = np.asarray(mask)
        s = np.where(m, np.asarray(plane), 0).ravel()
        r = np.where(m, np.asarray(refplane), 0).ravel()
        assert np.isfinite(s).all()
        corr = np.corrcoef(r, s)[0, 1]
        assert corr > 0.99, f"tight-slim8 decorrelated: r={corr:.4f}"


def test_tabulated_filters_match_module(setup):
    """tabulate=K replaces the 12 filter MLPs + learnable softplus +
    distance-weight sigmoids + envelope with one lerp'd table gather; at
    K=2048 over [0, cutoff] the interpolation error is far below 1e-3."""
    config, batch, variables, ref, mols = setup
    cap = pair_capacity_for(max(len(m.atom_type) for m in mols))
    fwd = build_tight_forward(config, variables, capacity=cap, tabulate=2048)
    out = jax.jit(lambda b: fwd(b))(batch)
    em, lm = np.asarray(ref.edge_mask), np.asarray(ref.local_mask)
    g = np.where(em, np.asarray(out.edge_inv_global), 0)
    rg = np.where(em, np.asarray(ref.edge_inv_global), 0)
    np.testing.assert_allclose(g, rg, rtol=2e-3, atol=2e-3)
    li = np.where(lm, np.asarray(out.edge_inv_local), 0)
    rl = np.where(lm, np.asarray(ref.edge_inv_local), 0)
    # the local branch never consumes the tables (GIN uses raw edge
    # features) — it must stay bit-comparable to the untabulated engine
    np.testing.assert_allclose(li, rl, rtol=2e-4, atol=2e-4)


def test_tight_shared_matches_module_on_repeated_molecule(setup):
    """shared=True uses graph 0's pair list for the whole batch — the
    reference generation pattern (one molecule repeated 2x num_refs)."""
    config, _, _, _, _ = setup
    mol = synthetic_dataset(1, seed=11, min_heavy=6, max_heavy=6)[0]
    batch = pad_molecules([mol] * 5, max_nodes=N_MAX, edge_order=3,
                          batch_size=5)
    # different positions per copy (as during sampling)
    noisy = np.asarray(batch.pos) + 0.1 * np.random.default_rng(0).normal(
        size=batch.pos.shape).astype(np.float32)
    batch = batch.replace(pos=jnp.asarray(noisy) * batch.node_mask[..., None])
    model = get_model(config)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    ref = model.apply(variables, batch, train=False)
    cap = pair_capacity_for(len(mol.atom_type))
    fwd = build_tight_forward(config, variables, capacity=cap, shared=True)
    out = jax.jit(lambda b: fwd(b))(batch)
    em, lm = np.asarray(ref.edge_mask), np.asarray(ref.local_mask)
    np.testing.assert_allclose(
        np.where(em, np.asarray(out.edge_inv_global), 0),
        np.where(em, np.asarray(ref.edge_inv_global), 0),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.where(lm, np.asarray(out.edge_inv_local), 0),
        np.where(lm, np.asarray(ref.edge_inv_local), 0),
        rtol=2e-4, atol=2e-4)


def test_tight_sampler_with_prepare_hoist(setup):
    """End-to-end: build_fast_sampler(engine='tight') runs the ladder with
    pair lists hoisted out of the scan and matches the module-path sampler."""
    from agdiff_tpu.models.schedules import make_diffusion
    from agdiff_tpu.sampling import SamplerConfig, build_sampler
    from agdiff_tpu.sampling.langevin import build_fast_sampler

    config, batch, variables, _, mols = setup
    diffusion = make_diffusion(config)
    scfg = SamplerConfig(n_steps=10, clip_local=20.0)
    cap = pair_capacity_for(max(len(m.atom_type) for m in mols))
    fast = build_fast_sampler(config, variables, diffusion, scfg,
                              engine="tight", pair_capacity=cap)
    ref_sampler = build_sampler(get_model(config), diffusion, scfg)
    pos_init = jax.random.normal(jax.random.PRNGKey(5), batch.pos.shape)
    out_fast = fast(batch, pos_init, jax.random.PRNGKey(6))
    out_ref = ref_sampler(variables, batch, pos_init, jax.random.PRNGKey(6))
    np.testing.assert_allclose(np.asarray(out_fast.pos),
                               np.asarray(out_ref.pos), rtol=1e-3, atol=1e-4)
    assert not bool(np.asarray(out_fast.nan_flags).any())


@pytest.mark.parametrize("mode", ["schnet", "gin", "full"])
def test_tight_packed_stack_matches_module(setup, mode, monkeypatch):
    """packed_stack over the TIGHT shared pair list (engines tight-pks/
    tight-pksg/tight-pksf): the whole-stack Pallas kernel
    (ops/pallas/stack_packed.py) with the PairPack's traced one-hot
    endpoint selectors in place of the static triu selectors — kernel
    pair volume = capacity, not N(N-1)/2. Module-equal at f32
    (interpret mode on CPU; same bar as the fast-path pks tests)."""
    from agdiff_tpu.ops.pallas import stack_packed

    monkeypatch.setattr(stack_packed, "_INTERPRET", True)
    config, _, _, _, _ = setup
    mol = synthetic_dataset(1, seed=11, min_heavy=6, max_heavy=6)[0]
    batch = pad_molecules([mol] * 5, max_nodes=N_MAX, edge_order=3,
                          batch_size=5)
    noisy = np.asarray(batch.pos) + 0.1 * np.random.default_rng(0).normal(
        size=batch.pos.shape).astype(np.float32)
    batch = batch.replace(pos=jnp.asarray(noisy) * batch.node_mask[..., None])
    model = get_model(config)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    ref = model.apply(variables, batch, train=False)
    cap = pair_capacity_for(len(mol.atom_type))
    assert cap < N_MAX * (N_MAX - 1) // 2  # the tight volume cut is real
    fwd = build_tight_forward(config, variables, capacity=cap, shared=True,
                              packed_stack=mode)
    out = jax.jit(lambda b: fwd(b))(batch)
    em, lm = np.asarray(ref.edge_mask), np.asarray(ref.local_mask)
    np.testing.assert_allclose(
        np.where(em, np.asarray(out.edge_inv_global), 0),
        np.where(em, np.asarray(ref.edge_inv_global), 0),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.where(lm, np.asarray(out.edge_inv_local), 0),
        np.where(lm, np.asarray(ref.edge_inv_local), 0),
        rtol=2e-4, atol=2e-4)


def test_tight_packed_stack_requires_shared(setup):
    config, _, variables, _, _ = setup
    with pytest.raises(ValueError, match="shared"):
        build_tight_forward(config, variables, capacity=128,
                            packed_stack="full")
