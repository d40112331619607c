"""The optimized inference path (models/fast_forward.py) must equal the flax
module's eval-mode forward on every consumed (masked) value."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.models.dualenc import get_model
from agdiff_tpu.models.fast_forward import build_fast_forward
from agdiff_tpu.ops.pallas import fused


@pytest.fixture(scope="module")
def setup(small_config):
    mols = synthetic_dataset(3, seed=21, min_heavy=3, max_heavy=5)
    batch = pad_molecules(mols, 16, batch_size=3)
    model = get_model(small_config)
    variables = model.init(jax.random.PRNGKey(9), batch, train=False)
    golden = model.apply(variables, batch, train=False)
    return small_config, batch, variables, golden


def _compare(out, golden):
    em = np.asarray(golden.edge_mask)
    lm = np.asarray(golden.local_mask)
    np.testing.assert_array_equal(np.asarray(out.edge_mask), em)
    np.testing.assert_array_equal(np.asarray(out.local_mask), lm)
    np.testing.assert_allclose(
        np.where(em, np.asarray(out.edge_inv_global), 0),
        np.where(em, np.asarray(golden.edge_inv_global), 0),
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.where(lm, np.asarray(out.edge_inv_local), 0),
        np.where(lm, np.asarray(golden.edge_inv_local), 0),
        atol=2e-4,
    )


class TestFastForward:
    def test_xla_variant_matches_module(self, setup):
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False)
        _compare(fwd(batch), golden)

    def test_stacked_variant_matches_module(self, setup):
        """stack_filters=True: one wide filter matmul + packed distance
        weights + single F=192 mirror per block must equal the module."""
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 stack_filters=True)
        _compare(fwd(batch), golden)

    def test_stacked_variant_trained_weights(self, setup, small_config):
        """With non-trivial BN stats + trained distance-weight MLPs (the
        stacked path re-groups those weights), still module-equal."""
        from agdiff_tpu.config import Config, TrainConfig
        from agdiff_tpu.train.train_step import (
            create_train_state,
            make_train_step,
        )

        mols = synthetic_dataset(4, seed=23, min_heavy=3, max_heavy=4)
        batch = pad_molecules(mols, 16, batch_size=4)
        cfg = Config(model=small_config, train=TrainConfig(batch_size=4))
        model, state = create_train_state(cfg, jax.random.PRNGKey(2), 16, 4)
        step = make_train_step(model, cfg, donate=False)
        for k in range(5):
            state, _ = step(state, batch, jax.random.PRNGKey(200 + k))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        golden = model.apply(variables, batch, train=False)
        fwd = build_fast_forward(small_config, variables, use_pallas=False,
                                 stack_filters=True)
        _compare(fwd(batch), golden)

    def test_slim_storage_variant_close_to_module(self, setup):
        """store_dtype=bfloat16 narrows only STORAGE (f32 accumulation
        everywhere); scores must track the module to bf16 quantization
        error. Quality-gated like approx — not bit-exact."""
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 store_dtype=jnp.bfloat16)
        out = fwd(batch)
        em = np.asarray(golden.edge_mask)
        lm = np.asarray(golden.local_mask)
        np.testing.assert_array_equal(np.asarray(out.edge_mask), em)
        g = np.where(em, np.asarray(golden.edge_inv_global), 0)
        s = np.where(em, np.asarray(out.edge_inv_global), 0)
        scale = max(np.abs(g).max(), 1e-6)
        assert np.abs(s - g).max() / scale < 0.05, (
            f"slim global scores off by {np.abs(s - g).max() / scale:.3f} "
            "relative")
        gl = np.where(lm, np.asarray(golden.edge_inv_local), 0)
        sl = np.where(lm, np.asarray(out.edge_inv_local), 0)
        scale_l = max(np.abs(gl).max(), 1e-6)
        assert np.abs(sl - gl).max() / scale_l < 0.05

    def test_edge_dtype_variant_close_to_module(self, setup):
        """edge_dtype=bfloat16 narrows the edge-encoder chain (weights +
        intermediates) from the first matmul on; the f32 feature
        expansion keeps the distance input unquantized. Scores must
        track the module to bf16 quantization error (quality-gated like
        slim — not bit-exact). Engine suffix '-e16' in
        sampling.langevin.build_fast_sampler."""
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 store_dtype=jnp.bfloat16,
                                 edge_dtype=jnp.bfloat16)
        out = fwd(batch)
        em = np.asarray(golden.edge_mask)
        lm = np.asarray(golden.local_mask)
        np.testing.assert_array_equal(np.asarray(out.edge_mask), em)
        g = np.where(em, np.asarray(golden.edge_inv_global), 0)
        s = np.where(em, np.asarray(out.edge_inv_global), 0)
        scale = max(np.abs(g).max(), 1e-6)
        assert np.abs(s - g).max() / scale < 0.05, (
            f"e16 global scores off by {np.abs(s - g).max() / scale:.3f} "
            "relative")
        gl = np.where(lm, np.asarray(golden.edge_inv_local), 0)
        sl = np.where(lm, np.asarray(out.edge_inv_local), 0)
        scale_l = max(np.abs(gl).max(), 1e-6)
        assert np.abs(sl - gl).max() / scale_l < 0.05

    def test_slim8_storage_variant_finite_and_correlated(self, setup):
        """store_dtype=float8_e4m3fn: aggressive 1-byte storage. fp8 has
        ~6% max relative quantization error per element; after masked
        aggregation the scores must stay finite and strongly correlated
        with the module's (the quality gate proper is the paired protocol
        eval, tools/ab_engines.py + cli.generate --engine slim8)."""
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 store_dtype=jnp.float8_e4m3fn)
        out = fwd(batch)
        em = np.asarray(golden.edge_mask)
        g = np.where(em, np.asarray(golden.edge_inv_global), 0).ravel()
        s = np.where(em, np.asarray(out.edge_inv_global), 0).ravel()
        assert np.isfinite(s).all()
        corr = np.corrcoef(g, s)[0, 1]
        assert corr > 0.99, f"slim8 decorrelated from module: r={corr:.4f}"

    def test_pallas_variant_matches_module(self, setup, monkeypatch):
        monkeypatch.setattr(fused, "_INTERPRET", True)
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=True)
        _compare(fwd(batch), golden)

    def test_score_dots_variant_matches_module(self, setup):
        """score_dots=True: pair-score endpoint rows via one-hot MXU dots
        (exact row selection) + the first score matmul split across the
        concat — module-equal at f32."""
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 score_dots=True)
        _compare(fwd(batch), golden)

    def test_packed_kernel_variant_matches_module(self, setup, monkeypatch):
        """packed_kernel=True: filter MLPs + one-hot endpoint aggregation
        inside ops/pallas/block_packed.py (no dense filter mirrors). At
        f32 compute this is module-equal to accumulation-order noise."""
        from agdiff_tpu.ops.pallas import block_packed

        monkeypatch.setattr(block_packed, "_INTERPRET", True)
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 packed_kernel=True)
        _compare(fwd(batch), golden)

    def test_packed_kernel_with_slim_storage(self, setup, monkeypatch):
        """The production composition (engine 'pk'): packed kernel blocks +
        store_dtype narrowing of the GIN mirror / score heads."""
        from agdiff_tpu.ops.pallas import block_packed

        monkeypatch.setattr(block_packed, "_INTERPRET", True)
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 packed_kernel=True,
                                 store_dtype=jnp.bfloat16)
        out = fwd(batch)
        em = np.asarray(golden.edge_mask)
        g = np.where(em, np.asarray(golden.edge_inv_global), 0)
        s = np.where(em, np.asarray(out.edge_inv_global), 0)
        scale = max(np.abs(g).max(), 1e-6)
        assert np.abs(s - g).max() / scale < 0.05

    def test_packed_stack_variant_matches_module(self, setup, monkeypatch):
        """packed_stack=True (engine 'pks'): the WHOLE interaction stack —
        filter MLPs, endpoint aggregation, node MLPs, attention + SE gates,
        residuals — as ONE kernel in ops/pallas/stack_packed.py. At f32
        compute this is module-equal to accumulation-order noise."""
        from agdiff_tpu.ops.pallas import stack_packed

        monkeypatch.setattr(stack_packed, "_INTERPRET", True)
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 packed_stack=True)
        _compare(fwd(batch), golden)

    def test_packed_stack_gin_matches_module(self, setup, monkeypatch):
        """packed_stack='gin' (engine 'pksg'): the GIN local branch joins
        the whole-stack kernel — packed messages relu(m*(hl_j + e)) with
        the stacked endpoint selectors instead of the dense message
        mirror. Module-equal at f32."""
        from agdiff_tpu.ops.pallas import stack_packed

        monkeypatch.setattr(stack_packed, "_INTERPRET", True)
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 packed_stack="gin")
        _compare(fwd(batch), golden)

    def test_packed_stack_full_matches_module(self, setup, monkeypatch):
        """packed_stack='full' (engine 'pksf'): the kernel also runs both
        pair-score MLP heads and emits only the packed score planes.
        Module-equal at f32."""
        from agdiff_tpu.ops.pallas import stack_packed

        monkeypatch.setattr(stack_packed, "_INTERPRET", True)
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 packed_stack="full")
        _compare(fwd(batch), golden)

    def test_packed_stack_approx_matches_xla_approx(self, setup,
                                                    monkeypatch):
        """Engine 'pksf-approx': the whole-stack kernel with the polynomial
        transcendentals (ops/approx.py) passed in as softplus_fn/sigmoid_fn.
        The XLA approx engine runs the SAME polynomial functions, so at f32
        the two must agree to accumulation-order noise — the approximation
        error itself (bounded by tests/test_approx.py) cancels out of this
        comparison. Motivation: inside the kernel the filter-MLP softplus
        is EXPOSED VPU (not hidden under HBM traffic as in the XLA path,
        where round 3 measured activations at 0.3% of the step), so the
        cheap polynomials can matter exactly where the exact ones don't."""
        from agdiff_tpu.ops.pallas import stack_packed

        monkeypatch.setattr(stack_packed, "_INTERPRET", True)
        cfg, batch, variables, _ = setup
        ref = build_fast_forward(cfg, variables, use_pallas=False,
                                 approx=True)(batch)
        out = build_fast_forward(cfg, variables, use_pallas=False,
                                 approx=True, packed_stack="full")(batch)
        em = np.asarray(ref.edge_mask)
        lm = np.asarray(ref.local_mask)
        np.testing.assert_allclose(
            np.where(em, np.asarray(out.edge_inv_global), 0),
            np.where(em, np.asarray(ref.edge_inv_global), 0), atol=2e-4)
        np.testing.assert_allclose(
            np.where(lm, np.asarray(out.edge_inv_local), 0),
            np.where(lm, np.asarray(ref.edge_inv_local), 0), atol=2e-4)

    def test_packed_stack_with_slim_storage(self, setup, monkeypatch):
        """The production composition (engine 'pks'): whole-stack kernel +
        store_dtype narrowing of the GIN mirror / score heads."""
        from agdiff_tpu.ops.pallas import stack_packed

        monkeypatch.setattr(stack_packed, "_INTERPRET", True)
        cfg, batch, variables, golden = setup
        fwd = build_fast_forward(cfg, variables, use_pallas=False,
                                 packed_stack=True,
                                 store_dtype=jnp.bfloat16)
        out = fwd(batch)
        em = np.asarray(golden.edge_mask)
        g = np.where(em, np.asarray(golden.edge_inv_global), 0)
        s = np.where(em, np.asarray(out.edge_inv_global), 0)
        scale = max(np.abs(g).max(), 1e-6)
        assert np.abs(s - g).max() / scale < 0.05

    def test_trained_weights_not_just_init(self, setup, small_config):
        """Run a few training steps first so BN running stats are non-trivial,
        then check the folded fast path still matches."""
        from agdiff_tpu.config import Config, TrainConfig
        from agdiff_tpu.train.train_step import create_train_state, make_train_step

        mols = synthetic_dataset(4, seed=22, min_heavy=3, max_heavy=4)
        batch = pad_molecules(mols, 16, batch_size=4)
        cfg = Config(model=small_config, train=TrainConfig(batch_size=4))
        model, state = create_train_state(cfg, jax.random.PRNGKey(1), 16, 4)
        step = make_train_step(model, cfg, donate=False)
        for k in range(5):
            state, _ = step(state, batch, jax.random.PRNGKey(100 + k))
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        golden = model.apply(variables, batch, train=False)
        fwd = build_fast_forward(small_config, variables, use_pallas=False)
        _compare(fwd(batch), golden)

    def test_fast_sampler_matches_module_sampler(self, setup, small_config):
        """End-to-end: the sampler driven by fast_forward produces the same
        trajectory as the module-driven sampler (same keys)."""
        from agdiff_tpu.data.bucketing import repeat_molecule
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig, build_sampler
        from agdiff_tpu.sampling.langevin import build_fast_sampler

        cfg, batch, variables, _ = setup
        mol = synthetic_dataset(1, seed=23, min_heavy=3, max_heavy=3)[0]
        gen = repeat_molecule(mol, 2, max_nodes=16)
        diffusion = make_diffusion(small_config)
        scfg = SamplerConfig(n_steps=10, w_global=0.3)
        model = get_model(small_config)
        ref = build_sampler(model, diffusion, scfg)
        fast = build_fast_sampler(small_config, variables, diffusion, scfg,
                                  use_pallas=False)
        pos_init = jax.random.normal(jax.random.PRNGKey(5), gen.pos.shape)
        r1 = ref(variables, gen, pos_init, jax.random.PRNGKey(6))
        r2 = fast(gen, pos_init, jax.random.PRNGKey(6))
        np.testing.assert_allclose(
            np.asarray(r1.pos), np.asarray(r2.pos), atol=5e-4
        )
