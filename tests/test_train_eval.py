"""Training pipeline, checkpointing, sampler, parallel, and evaluation
tests (covering SURVEY.md section 4's recommended pyramid)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agdiff_tpu.config import Config, ModelConfig, TrainConfig
from agdiff_tpu.data.bucketing import pad_molecules, repeat_molecule
from agdiff_tpu.data.dataset import (
    BucketedLoader,
    ConformationDataset,
    PackedConformationDataset,
)
from agdiff_tpu.data.synthetic import synthetic_dataset


@pytest.fixture(scope="module")
def smoke_config():
    return Config(
        model=ModelConfig(
            hidden_dim=32, num_convs=2, num_convs_local=2,
            num_diffusion_timesteps=100,
        ),
        train=TrainConfig(batch_size=8, val_freq=20, max_iters=40),
    )


class TestOptimizerPartition:
    def test_partition_labels(self, smoke_config):
        from agdiff_tpu.models.dualenc import init_model
        from agdiff_tpu.train.optimizer import param_partition

        _, variables = init_model(
            smoke_config.model, jax.random.PRNGKey(0), max_nodes=16
        )
        labels = param_partition(variables["params"])
        flat = {
            "/".join(str(x) for x in path): v
            for path, v in jax.tree_util.tree_leaves_with_path(labels)
        }
        locals_ = [k for k, v in flat.items() if v == "local"]
        globals_ = [k for k, v in flat.items() if v == "global"]
        assert any("encoder_local" in k for k in locals_)
        assert any("grad_local_dist_mlp" in k for k in locals_)
        assert any("encoder_global" in k for k in globals_)
        assert not any("local" in k for k in globals_)

    def test_independent_lrs(self, smoke_config):
        from agdiff_tpu.train.optimizer import (
            get_learning_rates,
            make_optimizer,
            set_learning_rates,
        )
        from agdiff_tpu.models.dualenc import init_model

        _, variables = init_model(
            smoke_config.model, jax.random.PRNGKey(0), max_nodes=16
        )
        tx = make_optimizer(smoke_config.train)
        opt_state = tx.init(variables["params"])
        opt_state = set_learning_rates(opt_state, 1e-3, 5e-4)
        lrs = get_learning_rates(opt_state)
        assert lrs == pytest.approx((1e-3, 5e-4), rel=1e-5)

    def test_plateau_controller(self):
        from agdiff_tpu.config import SchedulerConfig
        from agdiff_tpu.train.optimizer import plateau_init, plateau_update

        sched = SchedulerConfig(factor=0.5, patience=2)
        st = plateau_init(1.0)
        st = plateau_update(st, 10.0, sched)  # improvement (best inf)
        assert st.lr == 1.0 and st.num_bad == 0
        for _ in range(3):  # 3 bad epochs > patience 2 -> decay
            st = plateau_update(st, 11.0, sched)
        assert st.lr == 0.5
        st = plateau_update(st, 5.0, sched)  # recovers
        assert st.num_bad == 0 and st.best == 5.0


class TestTrainLoop:
    def test_overfit_loss_decreases(self, smoke_config):
        from agdiff_tpu.train.train_step import create_train_state, make_train_step

        mols = synthetic_dataset(8, seed=0, min_heavy=3, max_heavy=4)
        batch = pad_molecules(mols, 16, batch_size=8)
        model, state = create_train_state(
            smoke_config, jax.random.PRNGKey(0), max_nodes=16, batch_size=8
        )
        step = make_train_step(model, smoke_config)
        key = jax.random.PRNGKey(1)
        losses = []
        for _ in range(30):
            key, k = jax.random.split(key)
            state, metrics = step(state, batch, k)
            losses.append(float(metrics.loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        assert int(state.step) == 30

    def test_batch_stats_update(self, smoke_config):
        from agdiff_tpu.train.train_step import create_train_state, make_train_step

        mols = synthetic_dataset(4, seed=0, min_heavy=3, max_heavy=4)
        batch = pad_molecules(mols, 16, batch_size=4)
        cfg = Config(
            model=smoke_config.model,
            train=TrainConfig(batch_size=4),
        )
        model, state = create_train_state(
            cfg, jax.random.PRNGKey(0), max_nodes=16, batch_size=4
        )
        before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
        step = make_train_step(model, cfg)
        state, _ = step(state, batch, jax.random.PRNGKey(1))
        after = jax.tree_util.tree_leaves(state.batch_stats)[0]
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestCheckpoint:
    def test_save_load_roundtrip(self, smoke_config, tmp_path):
        from agdiff_tpu.train.checkpoint import (
            latest_checkpoint,
            load_checkpoint,
            save_checkpoint,
        )
        from agdiff_tpu.train.optimizer import plateau_init
        from agdiff_tpu.train.train_step import create_train_state

        model, state = create_train_state(
            smoke_config, jax.random.PRNGKey(0), max_nodes=16, batch_size=4
        )
        log_dir = str(tmp_path / "run")
        save_checkpoint(
            log_dir, 5, smoke_config, state, plateau_init(1e-3),
            plateau_init(1e-3), avg_val_loss=12.5, best=True,
        )
        path, it = latest_checkpoint(log_dir)
        assert it == 5
        ckpt = load_checkpoint(path, target=state)
        assert ckpt["iteration"] == 5
        assert ckpt["avg_val_loss"] == 12.5
        assert ckpt["config"].model.hidden_dim == 32
        leaves_a = jax.tree_util.tree_leaves(state.params)
        leaves_b = jax.tree_util.tree_leaves(ckpt["params"])
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestSampler:
    def test_sampler_runs_and_centers(self, smoke_config):
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig, build_sampler

        mols = synthetic_dataset(1, seed=2, min_heavy=3, max_heavy=3,
                                 num_conformers=2)
        mol = mols[0]
        batch = repeat_molecule(mol, 4, max_nodes=16)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=20, w_global=0.3)
        sampler = build_sampler(model, diffusion, scfg)
        pos_init = jax.random.normal(jax.random.PRNGKey(3), batch.pos.shape)
        res = sampler(variables, batch, pos_init, jax.random.PRNGKey(4))
        pos = np.asarray(res.pos)
        assert np.isfinite(pos).all()
        assert not np.asarray(res.nan_flags).any()
        # CoM centered per graph over real nodes
        n = mol.num_nodes
        np.testing.assert_allclose(
            pos[:, :n].mean(axis=1), 0.0, atol=1e-4
        )

    def test_sampler_traj_stride(self, smoke_config):
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig, build_sampler

        mol = synthetic_dataset(1, seed=2, min_heavy=3, max_heavy=3)[0]
        batch = repeat_molecule(mol, 2, max_nodes=16)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=20, traj_stride=5)
        sampler = build_sampler(model, diffusion, scfg)
        pos_init = jax.random.normal(jax.random.PRNGKey(3), batch.pos.shape)
        res = sampler(variables, batch, pos_init, jax.random.PRNGKey(4))
        assert res.traj is not None
        assert res.traj.shape[0] == 4  # 20 // 5

    def test_sampler_denoise_tail(self, smoke_config):
        """denoise_tail: extra noise-free steps move positions (gradient
        polish) but keep them finite and centered; tail=0 is unchanged
        reference semantics."""
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig, build_sampler

        mol = synthetic_dataset(1, seed=2, min_heavy=3, max_heavy=3)[0]
        batch = repeat_molecule(mol, 2, max_nodes=16)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        pos_init = jax.random.normal(jax.random.PRNGKey(3), batch.pos.shape)
        base = build_sampler(model, diffusion, SamplerConfig(n_steps=8))(
            variables, batch, pos_init, jax.random.PRNGKey(4))
        tail = build_sampler(model, diffusion,
                             SamplerConfig(n_steps=8, denoise_tail=6))(
            variables, batch, pos_init, jax.random.PRNGKey(4))
        a, b = np.asarray(base.pos), np.asarray(tail.pos)
        assert np.isfinite(b).all()
        assert np.abs(a - b).max() > 1e-7  # the tail did something
        n = mol.num_nodes
        np.testing.assert_allclose(b[:, :n].mean(axis=1), 0.0, atol=1e-4)


class TestParallel:
    def test_dp_matches_single_device(self, smoke_config):
        from agdiff_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            shard_graph_batch,
        )
        from agdiff_tpu.train.train_step import create_train_state, make_train_step

        mols = synthetic_dataset(8, seed=0, min_heavy=3, max_heavy=4)
        batch = pad_molecules(mols, 16, batch_size=8)
        model, state = create_train_state(
            smoke_config, jax.random.PRNGKey(0), max_nodes=16, batch_size=8
        )
        single = make_train_step(model, smoke_config, donate=False)
        _, m1 = single(state, batch, jax.random.PRNGKey(5))

        mesh = make_mesh(8)
        par = make_parallel_train_step(model, smoke_config, mesh, donate=False)
        sharded = shard_graph_batch(batch, mesh)
        _, mp_ = par(state, sharded, jax.random.PRNGKey(5))
        np.testing.assert_allclose(
            float(m1.loss), float(mp_.loss), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(m1.grad_norm), float(mp_.grad_norm), rtol=1e-4
        )

    def test_dp_matches_single_device_packed_pairs(self, smoke_config):
        """8-way DP with config.packed_pairs: sharded loss/grad-norm must
        match the single-device dense AND packed steps."""
        import dataclasses

        from agdiff_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            shard_graph_batch,
        )
        from agdiff_tpu.train.train_step import create_train_state, make_train_step

        cfg = dataclasses.replace(
            smoke_config,
            model=dataclasses.replace(smoke_config.model, packed_pairs=True),
        )
        mols = synthetic_dataset(8, seed=0, min_heavy=3, max_heavy=4)
        batch = pad_molecules(mols, 16, batch_size=8)
        model, state = create_train_state(
            cfg, jax.random.PRNGKey(0), max_nodes=16, batch_size=8
        )
        single = make_train_step(model, cfg, donate=False)
        _, m1 = single(state, batch, jax.random.PRNGKey(5))

        mesh = make_mesh(8)
        par = make_parallel_train_step(model, cfg, mesh, donate=False)
        sharded = shard_graph_batch(batch, mesh)
        _, mp_ = par(state, sharded, jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(m1.loss), float(mp_.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m1.grad_norm), float(mp_.grad_norm),
                                   rtol=1e-4)

    def test_dryrun_multichip(self):
        import importlib.util
        import os

        spec = importlib.util.spec_from_file_location(
            "_graft", os.path.join(os.path.dirname(__file__), "..",
                                   "__graft_entry__.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)


class TestEvaluation:
    def test_best_rmsd_symmetry(self):
        """Swapping two symmetric atoms must not change best_rmsd."""
        from agdiff_tpu.chem import best_rmsd
        from agdiff_tpu.chem.mol import Molecule
        from agdiff_tpu.chem.constants import BondType

        # C(F)(F): central carbon with two fluorines — F atoms interchangeable
        s = int(BondType.SINGLE)
        # deliberately unequal C-F distances so the atom swap is NOT close
        # to any rigid motion (a near-symmetric geometry would make plain
        # Kabsch also ~0 and prove nothing)
        mol = Molecule(
            atom_type=[6, 9, 9],
            pos=[[0, 0, 0], [1.4, 0, 0], [0, 2.2, 0]],
            bond_index=[[0, 1, 0, 2], [1, 0, 2, 0]],
            bond_type=[s, s, s, s],
        )
        ref = np.array(mol.pos)
        gen_swapped = ref[[0, 2, 1]]  # permute the two F atoms
        r = best_rmsd(mol, ref, gen_swapped)
        assert r < 1e-6  # symmetry-aware: the swap is an automorphism
        # plain Kabsch would NOT be ~0
        from agdiff_tpu.chem import kabsch_rmsd

        assert kabsch_rmsd(ref, gen_swapped) > 0.3

    def test_covmat_evaluator(self):
        from agdiff_tpu.eval.covmat import CovMatEvaluator, print_covmat_results

        mols = synthetic_dataset(3, seed=1, min_heavy=4, max_heavy=5,
                                 num_conformers=2)
        for m in mols:
            n = m.num_nodes
            refs = m.pos_ref.reshape(-1, n, 3)
            # gens = refs + tiny noise, 2x ratio
            gens = np.concatenate([refs, refs], axis=0)
            gens = gens + np.random.default_rng(0).normal(
                scale=0.01, size=gens.shape
            )
            m.meta["pos_gen"] = gens.astype(np.float32)
        ev = CovMatEvaluator(num_workers=1)
        results = ev(mols)
        assert results.CoverageR.shape == (3, 60)
        # gens are near-copies of refs: coverage ~1 at moderate thresholds
        assert results.CoverageR[:, -1].min() == 1.0
        assert results.MatchingR.max() < 0.1
        print_covmat_results(results, print_fn=lambda *_: None)

    def test_covmat_filters(self):
        from agdiff_tpu.eval.covmat import CovMatEvaluator

        mols = synthetic_dataset(2, seed=1, min_heavy=4, max_heavy=4,
                                 num_conformers=2)
        n0 = mols[0].num_nodes
        # too few gens -> filtered out
        mols[0].meta["pos_gen"] = np.zeros((1, n0, 3), np.float32)
        # disconnected smiles -> filtered out
        mols[1].meta["pos_gen"] = np.zeros(
            (4, mols[1].num_nodes, 3), np.float32
        )
        mols[1].smiles = "C.C"
        ev = CovMatEvaluator(num_workers=1)
        assert len(ev.filter(mols)) == 0


class TestGenerationRunner:
    def test_generate_resume_and_retry_shapes(self, smoke_config, tmp_path):
        from agdiff_tpu.eval.generate import GenerationRunner, load_samples
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig

        mols = synthetic_dataset(2, seed=3, min_heavy=3, max_heavy=3,
                                 num_conformers=2)
        batch = pad_molecules(mols, 16, batch_size=2)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        runner = GenerationRunner(
            model, variables, make_diffusion(smoke_config.model),
            SamplerConfig(n_steps=10), buckets=(16,), chunk_size=4,
        )
        out = runner.run(mols, str(tmp_path / "samples"), num_confs="2x",
                         end_idx=2)
        assert len(out) == 2
        for mol, res in zip(mols, out):
            assert res.meta["pos_gen"].shape == (2 * mol.num_ref,
                                                 mol.num_nodes, 3)
        # resume: second run loads from disk (no recompute)
        out2 = runner.run(mols, str(tmp_path / "samples"), num_confs="2x",
                          end_idx=2)
        np.testing.assert_array_equal(
            out[0].meta["pos_gen"], out2[0].meta["pos_gen"]
        )
        loaded = load_samples(str(tmp_path / "samples" / "samples_all.npz"))
        assert len(loaded) == 2 and "pos_gen" in loaded[0].meta


class TestDataPipeline:
    def test_bucketed_loader(self):
        ds = ConformationDataset(
            synthetic_dataset(20, seed=4, min_heavy=3, max_heavy=6)
        )
        loader = BucketedLoader(ds, batch_size=4, buckets=(16, 24), seed=0)
        it = iter(loader)
        seen = set()
        for _ in range(5):
            bucket, batch = next(it)
            assert batch.atom_type.shape == (4, bucket)
            assert bool(batch.graph_mask.all())
            seen.add(bucket)
        # epoch_batches covers the whole dataset
        total = sum(
            int(b.graph_mask.sum()) for _, b in loader.epoch_batches()
        )
        assert total == 20

    def test_packed_dataset_packs_conformers(self):
        import dataclasses

        base = synthetic_dataset(2, seed=5, min_heavy=3, max_heavy=3)
        confs = []
        for m in base:
            for k in range(3):
                confs.append(dataclasses.replace(
                    m, pos=m.pos + 0.01 * k, pos_ref=None,
                    meta=dict(m.meta),
                ))
        packed = PackedConformationDataset(confs)
        assert len(packed) == 2
        assert packed.num_refs(0) == 3

    def test_molecule_npz_roundtrip(self, tmp_path):
        from agdiff_tpu.chem.mol import load_molecules, save_molecules

        mols = synthetic_dataset(3, seed=6, num_conformers=2)
        mols[0].meta = {"idx": 7, "boltzmannweight": 0.5}
        path = str(tmp_path / "mols.npz")
        save_molecules(path, mols)
        loaded = load_molecules(path)
        assert len(loaded) == 3
        np.testing.assert_array_equal(loaded[0].atom_type, mols[0].atom_type)
        np.testing.assert_allclose(loaded[0].pos_ref, mols[0].pos_ref)
        assert loaded[0].meta["idx"] == 7
        assert loaded[1].smiles == mols[1].smiles


class TestParallelSampler:
    def test_dp_sampler_matches_single(self, smoke_config):
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.parallel import make_mesh, make_parallel_sampler
        from agdiff_tpu.parallel.data_parallel import shard_graph_batch
        from agdiff_tpu.sampling import SamplerConfig, build_sampler

        mols = synthetic_dataset(1, seed=8, min_heavy=3, max_heavy=3)
        batch = pad_molecules(mols * 8, 16, batch_size=8)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=8, w_global=0.3)
        pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)

        single = build_sampler(model, diffusion, scfg)
        r1 = single(variables, batch, pos_init, jax.random.PRNGKey(2))

        mesh = make_mesh(8)
        par = make_parallel_sampler(model, diffusion, scfg, mesh)
        sharded = shard_graph_batch(batch, mesh)
        r2 = par(variables, sharded, pos_init, jax.random.PRNGKey(2))
        np.testing.assert_allclose(
            np.asarray(r1.pos), np.asarray(r2.pos), atol=1e-5
        )
        assert not np.asarray(r2.nan_flags).any()

    def test_dp_fast_engines_match_single(self, smoke_config):
        """Fast engines (xla / tight shared / tight per-graph) under the
        mesh == single-device: the multi-chip Drugs win composes with the
        tight engine (round-3; VERDICT r2 item 2)."""
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.models.tight_forward import pair_capacity_for
        from agdiff_tpu.parallel import make_mesh
        from agdiff_tpu.parallel.data_parallel import shard_graph_batch
        from agdiff_tpu.sampling import SamplerConfig
        from agdiff_tpu.sampling.langevin import build_fast_sampler

        mols = synthetic_dataset(1, seed=8, min_heavy=4, max_heavy=4)
        batch = pad_molecules(mols * 8, 16, batch_size=8)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=8, w_global=0.3)
        pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)
        cap = pair_capacity_for(mols[0].num_nodes)
        mesh = make_mesh(8)
        sharded = shard_graph_batch(batch, mesh)

        for engine, shared in [(None, False), ("tight", True),
                               ("tight", False)]:
            kw = dict(use_pallas=False, engine=engine,
                      pair_capacity=cap if engine else None,
                      shared_pairs=shared)
            single = build_fast_sampler(
                smoke_config.model, variables, diffusion, scfg, **kw)
            r1 = single(batch, pos_init, jax.random.PRNGKey(2))
            par = build_fast_sampler(
                smoke_config.model, variables, diffusion, scfg,
                mesh=mesh, **kw)
            r2 = par(sharded, pos_init, jax.random.PRNGKey(2))
            np.testing.assert_allclose(
                np.asarray(r1.pos), np.asarray(r2.pos), atol=1e-5)
            assert not np.asarray(r2.nan_flags).any()

    def test_dp_pks_engines_match_single(self, smoke_config, monkeypatch):
        """The whole-stack Pallas kernel engines (pksf, tight-pksf — the
        round-5 gated defaults) under the DP mesh == single-device, in
        interpret mode on the CPU mesh exactly as the parity tests run
        the kernel (VERDICT r4 #4: the prospective default needs
        multi-device correctness evidence)."""
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.models.tight_forward import pair_capacity_for
        from agdiff_tpu.ops.pallas import stack_packed
        from agdiff_tpu.parallel import make_mesh
        from agdiff_tpu.parallel.data_parallel import shard_graph_batch
        from agdiff_tpu.sampling import SamplerConfig
        from agdiff_tpu.sampling.langevin import build_fast_sampler

        monkeypatch.setattr(stack_packed, "_INTERPRET", True)
        mols = synthetic_dataset(1, seed=8, min_heavy=4, max_heavy=4)
        batch = pad_molecules(mols * 8, 16, batch_size=8)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=8, w_global=0.3)
        pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)
        cap = pair_capacity_for(mols[0].num_nodes)
        mesh = make_mesh(8)
        sharded = shard_graph_batch(batch, mesh)

        for engine, shared in [("pksf", False), ("tight-pksf", True)]:
            kw = dict(use_pallas=False, engine=engine,
                      pair_capacity=cap if shared else None,
                      shared_pairs=shared,
                      store_dtype=jnp.float32)  # f32: exact DP == single
            single = build_fast_sampler(
                smoke_config.model, variables, diffusion, scfg, **kw)
            r1 = single(batch, pos_init, jax.random.PRNGKey(2))
            par = build_fast_sampler(
                smoke_config.model, variables, diffusion, scfg,
                mesh=mesh, **kw)
            r2 = par(sharded, pos_init, jax.random.PRNGKey(2))
            np.testing.assert_allclose(
                np.asarray(r1.pos), np.asarray(r2.pos), atol=1e-5)
            assert not np.asarray(r2.nan_flags).any()


class TestFastRunner:
    def test_runner_use_fast_on_cpu(self, smoke_config):
        """use_fast runner path on CPU (Pallas auto-disabled -> XLA fast
        path with folded BatchNorm) matches the module-path runner."""
        from agdiff_tpu.eval.generate import GenerationRunner
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig

        mols = synthetic_dataset(1, seed=9, min_heavy=3, max_heavy=3,
                                 num_conformers=2)
        batch = pad_molecules(mols, 16, batch_size=1)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=6)
        common = dict(buckets=(16,), chunk_size=4)
        slow = GenerationRunner(model, variables, diffusion, scfg, **common)
        fast = GenerationRunner(model, variables, diffusion, scfg,
                                use_fast=True,
                                model_config=smoke_config.model, **common)
        key = jax.random.PRNGKey(3)
        a = slow.generate_molecule(mols[0], 4, key)
        b = fast.generate_molecule(mols[0], 4, key)
        np.testing.assert_allclose(a, b, atol=5e-4)

    def test_runner_tight_engine_on_cpu(self, smoke_config):
        """engine='tight' (shared packed pair lists sized to the molecule)
        matches the module-path runner."""
        from agdiff_tpu.eval.generate import GenerationRunner
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig

        mols = synthetic_dataset(1, seed=9, min_heavy=3, max_heavy=3,
                                 num_conformers=2)
        batch = pad_molecules(mols, 16, batch_size=1)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=6)
        common = dict(buckets=(16,), chunk_size=4)
        slow = GenerationRunner(model, variables, diffusion, scfg, **common)
        tight = GenerationRunner(model, variables, diffusion, scfg,
                                 use_fast=True, engine="tight",
                                 model_config=smoke_config.model, **common)
        key = jax.random.PRNGKey(3)
        a = slow.generate_molecule(mols[0], 4, key)
        b = tight.generate_molecule(mols[0], 4, key)
        np.testing.assert_allclose(a, b, atol=5e-4)

    def test_engine_auto_selection_dtype_gated(self, smoke_config):
        """bf16 configs auto-select the narrow-storage engines (slim at
        small buckets, tight-slim at bucket >= 40 — 1.174x / 1.061x,
        round-4 A/B + quality gate); f32 configs keep full-precision
        storage (fast-xla / tight). An explicit engine always wins."""
        import dataclasses

        from agdiff_tpu.eval.generate import GenerationRunner

        r = GenerationRunner.__new__(GenerationRunner)
        r.engine = None
        r.use_fast = True
        r.model_config = smoke_config.model  # f32
        assert r._engine_for(32) is None
        assert r._engine_for(64) == "tight"
        r.model_config = dataclasses.replace(smoke_config.model,
                                             dtype="bfloat16")
        assert r._engine_for(32) == "slim"
        assert r._engine_for(64) == "tight-slim"
        r.engine = "xla"
        assert r._engine_for(64) == "xla"
        r.engine = None
        r.use_fast = False
        assert r._engine_for(64) is None

    def test_engine_auto_selection_tpu_branch(self, smoke_config,
                                              monkeypatch):
        """On a TPU backend the bf16 auto-selection upgrades to the
        whole-stack Pallas kernel engines (pksf at small buckets,
        tight-pksf at bucket >= 40 — round-5 gates); CPU backends (this
        test suite) keep the pure-XLA slim engines because Mosaic needs
        the chip. Exercised here by faking the backend string — the TPU
        branch is otherwise invisible to CPU CI."""
        import dataclasses

        from agdiff_tpu.eval import generate as gen_mod
        from agdiff_tpu.eval.generate import GenerationRunner

        monkeypatch.setattr(gen_mod.jax, "default_backend", lambda: "tpu")
        r = GenerationRunner.__new__(GenerationRunner)
        r.engine = None
        r.use_fast = True
        r.model_config = dataclasses.replace(smoke_config.model,
                                             dtype="bfloat16")
        assert r._engine_for(32) == "pksf"
        assert r._engine_for(64) == "tight-pksf"
        r.model_config = smoke_config.model  # f32: kernels stay off
        assert r._engine_for(32) is None
        assert r._engine_for(64) == "tight"

    def test_runner_fast_engines_under_mesh(self, smoke_config):
        """use_fast (and engine='tight') with a mesh == without: the runner
        no longer forfeits the fast engines on multi-chip generation."""
        from agdiff_tpu.eval.generate import GenerationRunner
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.parallel import make_mesh
        from agdiff_tpu.sampling import SamplerConfig

        mols = synthetic_dataset(1, seed=9, min_heavy=3, max_heavy=3,
                                 num_conformers=2)
        batch = pad_molecules(mols, 16, batch_size=1)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        scfg = SamplerConfig(n_steps=6)
        mesh = make_mesh(8)
        key = jax.random.PRNGKey(3)
        for engine in (None, "tight"):
            common = dict(buckets=(16,), chunk_size=8, use_fast=True,
                          engine=engine, model_config=smoke_config.model)
            fast = GenerationRunner(model, variables, diffusion, scfg,
                                    **common)
            dp = GenerationRunner(model, variables, diffusion, scfg,
                                  mesh=mesh, **common)
            a = fast.generate_molecule(mols[0], 8, key)
            b = dp.generate_molecule(mols[0], 8, key)
            np.testing.assert_allclose(a, b, atol=5e-4)


class TestPackedGeneration:
    def test_packed_runner_fills_batches(self, smoke_config, tmp_path):
        from agdiff_tpu.eval.generate import PackedGenerationRunner
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig

        mols = synthetic_dataset(3, seed=12, min_heavy=3, max_heavy=3,
                                 num_conformers=2)
        batch = pad_molecules(mols, 16, batch_size=3)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        runner = PackedGenerationRunner(
            model, variables, make_diffusion(smoke_config.model),
            SamplerConfig(n_steps=6), buckets=(16,), chunk_size=4,
        )
        out = runner.run(mols, str(tmp_path / "packed"), num_confs="2x",
                         end_idx=3, resume=False)
        assert len(out) == 3
        for mol, res in zip(mols, out):
            gen = res.meta["pos_gen"]
            assert gen.shape == (2 * mol.num_ref, mol.num_nodes, 3)
            assert np.isfinite(gen).all()
            # samples within a molecule differ (independent init noise)
            assert np.abs(gen[0] - gen[1]).max() > 1e-4

    def test_packed_runner_tight_shared_groups(self, smoke_config, tmp_path):
        """engine='tight' in the packed runner: slots group by atom count,
        every chunk runs the shared pair-list layout, results match the
        module-path packed runner exactly (same slot keys + chunk keys)."""
        from agdiff_tpu.eval.generate import PackedGenerationRunner
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig

        base = synthetic_dataset(2, seed=12, min_heavy=3, max_heavy=3,
                                 num_conformers=2)
        # two distinct molecules, but identical atom count -> one group
        mols = [m for m in base if m.num_nodes == base[0].num_nodes][:2]
        if len(mols) < 2:
            mols = [base[0], base[0]]
        batch = pad_molecules(mols, 16, batch_size=2)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        common = dict(buckets=(16,), chunk_size=4)
        slow = PackedGenerationRunner(
            model, variables, make_diffusion(smoke_config.model),
            SamplerConfig(n_steps=6), **common)
        tight = PackedGenerationRunner(
            model, variables, make_diffusion(smoke_config.model),
            SamplerConfig(n_steps=6), use_fast=True, engine="tight",
            model_config=smoke_config.model, **common)
        a = slow.run(mols, str(tmp_path / "a"), num_confs="2x",
                     resume=False)
        b = tight.run(mols, str(tmp_path / "b"), num_confs="2x",
                      resume=False)
        for x, y in zip(a, b):
            np.testing.assert_allclose(
                x.meta["pos_gen"], y.meta["pos_gen"], atol=5e-4)
        # the tight sampler was built with molecule-sized shared capacity
        keys = [k for k in tight._samplers if k[3] == "tight"]
        assert keys and all(k[2] is not None for k in keys)


class TestMultiSliceMesh:
    def test_dcn_mesh_train_step(self, smoke_config):
        """2-slice x 4-chip ('dcn','dp') mesh: hierarchical DP matches the
        single-device step (SURVEY.md 2.5 multi-slice story)."""
        from agdiff_tpu.parallel import (
            make_mesh,
            make_parallel_train_step,
            shard_graph_batch,
        )
        from agdiff_tpu.train.train_step import create_train_state, make_train_step

        mols = synthetic_dataset(8, seed=0, min_heavy=3, max_heavy=4)
        batch = pad_molecules(mols, 16, batch_size=8)
        model, state = create_train_state(
            smoke_config, jax.random.PRNGKey(0), max_nodes=16, batch_size=8
        )
        single = make_train_step(model, smoke_config, donate=False)
        _, m1 = single(state, batch, jax.random.PRNGKey(5))

        mesh = make_mesh(8, dcn_slices=2)
        assert mesh.axis_names == ("dcn", "dp")
        par = make_parallel_train_step(model, smoke_config, mesh,
                                       donate=False)
        sharded = shard_graph_batch(batch, mesh)
        _, m2 = par(state, sharded, jax.random.PRNGKey(5))
        np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)


class TestNonFiniteGuard:
    def test_nonfinite_grads_skipped(self, smoke_config):
        import dataclasses

        from agdiff_tpu.train.optimizer import make_optimizer
        from agdiff_tpu.models.dualenc import init_model

        cfg = dataclasses.replace(smoke_config.train,
                                  skip_nonfinite_updates=True)
        _, variables = init_model(
            smoke_config.model, jax.random.PRNGKey(0), max_nodes=16
        )
        params = variables["params"]
        tx = make_optimizer(cfg)
        opt_state = tx.init(params)
        bad_grads = jax.tree_util.tree_map(
            lambda p: jnp.full_like(p, jnp.nan), params
        )
        updates, opt_state = tx.update(bad_grads, opt_state, params)
        # all updates must be exactly zero (step skipped)
        assert all(
            float(np.abs(np.asarray(u)).max()) == 0.0
            for u in jax.tree_util.tree_leaves(updates)
        )
        good_grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, opt_state = tx.update(good_grads, opt_state, params)
        assert any(
            float(np.abs(np.asarray(u)).max()) > 0
            for u in jax.tree_util.tree_leaves(updates)
        )
        # LR setters traverse the wrapper
        from agdiff_tpu.train.optimizer import (
            get_learning_rates,
            set_learning_rates,
        )

        opt_state = set_learning_rates(opt_state, 2e-4, 1e-4)
        assert get_learning_rates(opt_state) == pytest.approx(
            (2e-4, 1e-4), rel=1e-5
        )


class TestBF16Model:
    def test_bfloat16_forward_finite(self, tiny_batch):
        from agdiff_tpu.config import ModelConfig
        from agdiff_tpu.models.dualenc import get_model

        cfg = ModelConfig(hidden_dim=32, num_convs=2, num_convs_local=2,
                          num_diffusion_timesteps=50, dtype="bfloat16")
        model = get_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), tiny_batch, train=False)
        out = model.apply(variables, tiny_batch, train=False)
        assert out.edge_inv_global.dtype == jnp.float32  # outputs upcast
        assert np.isfinite(np.asarray(out.edge_inv_global)).all()


class TestStridedLadder:
    def test_strided_covers_full_range(self, smoke_config):
        """ladder='strided' visits high AND low noise; 'suffix' (reference
        semantics, dualenc.py:474) only the last n_steps levels."""
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig, build_sampler

        mol = synthetic_dataset(1, seed=2, min_heavy=3, max_heavy=3)[0]
        batch = repeat_molecule(mol, 2, max_nodes=16)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        diffusion = make_diffusion(smoke_config.model)
        pos_init = jax.random.normal(jax.random.PRNGKey(1), batch.pos.shape)
        for ladder in ("suffix", "strided"):
            scfg = SamplerConfig(n_steps=10, ladder=ladder, w_global=0.3)
            res = build_sampler(model, diffusion, scfg)(
                variables, batch, pos_init, jax.random.PRNGKey(2)
            )
            assert np.isfinite(np.asarray(res.pos)).all(), ladder


class TestEnsembleStatistics:
    def test_matches_reference_math(self):
        """ensemble_statistics == eval_prop.py:74-93 (get_ensemble_energy):
        mean/min energy, |homo-lumo| gap stats, all in eV."""
        from agdiff_tpu.eval.properties import (
            HARTREE_TO_EV,
            compare_ensembles,
            ensemble_statistics,
        )

        props = {
            "energy": [-1.0, -3.0, -2.0],
            "homo": [-0.3, -0.25, -0.35],
            "lumo": [-0.1, -0.05, -0.45],  # last: lumo < homo -> abs gap
        }
        s = ensemble_statistics(props)
        gaps = np.abs(np.array([0.2, 0.2, -0.1])) * HARTREE_TO_EV
        assert s["avg_energy"] == pytest.approx(-2.0 * HARTREE_TO_EV)
        assert s["low_energy"] == pytest.approx(-3.0 * HARTREE_TO_EV)
        assert s["avg_gap"] == pytest.approx(gaps.mean())
        assert s["min_gap"] == pytest.approx(gaps.min())
        assert s["max_gap"] == pytest.approx(gaps.max())

        diff = compare_ensembles(props, props)
        assert all(v == 0.0 for v in diff.values())


class TestChunkRightSizing:
    def test_batch_size_for(self, smoke_config):
        from agdiff_tpu.eval.generate import GenerationRunner

        from agdiff_tpu.sampling import SamplerConfig

        r = GenerationRunner(None, None, None,
                             SamplerConfig(n_steps=1), chunk_size=64)
        assert r._batch_size_for(64) == 64
        assert r._batch_size_for(65) == 64   # full chunk
        assert r._batch_size_for(40) == 64
        assert r._batch_size_for(20) == 32
        assert r._batch_size_for(9) == 16
        assert r._batch_size_for(8) == 8
        assert r._batch_size_for(1) == 8

    def test_partial_chunk_output_correct(self, smoke_config, tmp_path):
        """num_samples smaller than chunk_size still yields the right count
        (padded slots are generated but discarded)."""
        from agdiff_tpu.eval.generate import GenerationRunner
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling import SamplerConfig

        mols = synthetic_dataset(1, seed=3, min_heavy=3, max_heavy=3,
                                 num_conformers=1)
        batch = pad_molecules(mols, 16, batch_size=1)
        model = get_model(smoke_config.model)
        variables = model.init(jax.random.PRNGKey(0), batch, train=False)
        runner = GenerationRunner(
            model, variables, make_diffusion(smoke_config.model),
            SamplerConfig(n_steps=5), buckets=(16,), chunk_size=64,
        )
        pos = runner.generate_molecule(mols[0], 3, jax.random.PRNGKey(1))
        assert pos.shape == (3, mols[0].num_nodes, 3)
        assert np.isfinite(pos).all()


class TestRematParity:
    def test_gradients_match_baseline(self, smoke_config):
        """config.remat recomputes encoder activations in backward; the
        gradients must match the non-remat path (pre-BN biases excluded:
        their math gradient is exactly zero, both values are cancellation
        noise)."""
        import dataclasses

        from agdiff_tpu.models.loss import (
            diffusion_loss,
            perturb_positions,
            sample_timesteps,
        )
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.train import create_train_state

        mols = synthetic_dataset(2, seed=0, min_heavy=3, max_heavy=4)
        batch = pad_molecules(mols, 16, edge_order=3, batch_size=2)
        grads_out = []
        for remat in (False, True):
            cfg = dataclasses.replace(
                smoke_config,
                model=dataclasses.replace(smoke_config.model, remat=remat),
            )
            model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                              16, 2)
            diffusion = make_diffusion(cfg.model)
            alphas = jnp.asarray(diffusion.alphas)

            def loss_fn(params, model=model, cfg=cfg, state=state,
                        diffusion=diffusion, alphas=alphas):
                tkey, nkey = jax.random.split(jax.random.PRNGKey(1))
                t = sample_timesteps(tkey, batch.num_graphs,
                                     diffusion.num_timesteps)
                pos_p, a = perturb_positions(nkey, batch, alphas, t)
                out, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch.replace(pos=pos_p), train=True,
                    mutable=["batch_stats"])
                return diffusion_loss(out, batch, pos_p, a,
                                      cfg.model.cutoff).loss

            grads_out.append(jax.jit(jax.grad(loss_fn))(state.params))
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(grads_out[0]),
            jax.tree_util.tree_leaves_with_path(grads_out[1]),
        ):
            assert pa == pb
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max()
            if scale < 1e-4:
                continue
            assert np.abs(a - b).max() < 1e-5 + 1e-4 * scale, (
                pa, np.abs(a - b).max(), scale)


class TestChunkedTrainStep:
    def test_chunked_equals_k_single_steps(self, smoke_config):
        """make_chunked_train_step(K) with per-step keys == K sequential
        single steps (bit-identical state update path)."""
        import dataclasses

        from agdiff_tpu.train import create_train_state, make_train_step
        from agdiff_tpu.train.train_step import (
            make_chunked_train_step,
            stack_batches,
        )

        K = 3
        cfg = smoke_config
        mols = [synthetic_dataset(2, seed=s, min_heavy=3, max_heavy=4)
                for s in range(K)]
        batches = [pad_molecules(m, 16, edge_order=3, batch_size=2)
                   for m in mols]
        model, state0 = create_train_state(cfg, jax.random.PRNGKey(0), 16, 2)

        key = jax.random.PRNGKey(7)
        chunked = make_chunked_train_step(model, cfg, K, donate=False)
        s_chunk, m_chunk = chunked(state0, stack_batches(batches), key)

        step = make_train_step(model, cfg, donate=False)
        s_ref = state0
        for b, k in zip(batches, jax.random.split(key, K)):
            s_ref, m_ref = step(s_ref, b, k)

        np.testing.assert_allclose(float(m_chunk.loss), float(m_ref.loss),
                                   rtol=1e-6)
        for (pa, a), (pb, b_) in zip(
            jax.tree_util.tree_leaves_with_path(s_chunk.params),
            jax.tree_util.tree_leaves_with_path(s_ref.params),
        ):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=1e-6, err_msg=str(pa))

    def test_parallel_chunked_equals_single_device_chunked(self, smoke_config):
        """The DP chunked step (graph axis sharded over the 8-device mesh,
        K as the scan axis) matches the single-device chunked step."""
        from agdiff_tpu.parallel import make_mesh
        from agdiff_tpu.parallel.data_parallel import (
            make_parallel_chunked_train_step,
            shard_stacked_batches,
        )
        from agdiff_tpu.train import create_train_state
        from agdiff_tpu.train.train_step import (
            make_chunked_train_step,
            stack_batches,
        )

        K = 2
        cfg = smoke_config
        mols = [synthetic_dataset(8, seed=s, min_heavy=3, max_heavy=4)
                for s in range(K)]
        batches = [pad_molecules(m, 16, edge_order=3, batch_size=8)
                   for m in mols]
        model, state0 = create_train_state(cfg, jax.random.PRNGKey(0), 16, 8)
        stacked = stack_batches(batches)
        key = jax.random.PRNGKey(7)

        chunked = make_chunked_train_step(model, cfg, K, donate=False)
        s_a, m_a = chunked(state0, stacked, key)

        mesh = make_mesh(8)
        par = make_parallel_chunked_train_step(model, cfg, K, mesh,
                                               donate=False)
        s_b, m_b = par(state0, shard_stacked_batches(stacked, mesh), key)

        np.testing.assert_allclose(float(m_b.loss), float(m_a.loss),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m_b.grad_norm),
                                   float(m_a.grad_norm), rtol=1e-4)
        # Per-leaf param comparison is fragile here: params with (near-)zero
        # gradient drift by O(lr) under Adam from mere reduction-order noise
        # (psum vs single-device sum). Probe the LOSS LANDSCAPE instead: one
        # further identical step from each resulting state must see the same
        # loss — insensitive exactly in the flat directions where parameter
        # noise is meaningless.
        from agdiff_tpu.train.train_step import make_train_step

        probe = make_train_step(model, cfg, donate=False)
        pb_batch = batches[0]
        _, pm_a = probe(s_a, pb_batch, jax.random.PRNGKey(99))
        _, pm_b = probe(s_b, pb_batch, jax.random.PRNGKey(99))
        np.testing.assert_allclose(float(pm_b.loss), float(pm_a.loss),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(pm_b.grad_norm),
                                   float(pm_a.grad_norm), rtol=1e-3)

    def test_trainer_runs_with_step_chunk(self, smoke_config, tmp_path):
        import dataclasses

        from agdiff_tpu.data.dataset import ConformationDataset
        from agdiff_tpu.train.trainer import Trainer

        cfg = dataclasses.replace(
            smoke_config,
            train=dataclasses.replace(smoke_config.train, step_chunk=4,
                                      max_iters=9, val_freq=100),
        )
        ds = ConformationDataset(
            synthetic_dataset(12, seed=1, min_heavy=3, max_heavy=4))
        tr = Trainer(cfg, ds, None, str(tmp_path / "logs"), log_freq=4)
        state = tr.train()
        assert int(state.step) == 9  # 4 + 4 + 1 (remainder singles)

    def test_trainer_runs_with_step_chunk_under_mesh(self, smoke_config,
                                                     tmp_path):
        """Trainer with a DP mesh AND step_chunk > 1 takes the sharded
        chunked dispatch path end-to-end."""
        import dataclasses

        from agdiff_tpu.data.dataset import ConformationDataset
        from agdiff_tpu.parallel import make_mesh
        from agdiff_tpu.train.trainer import Trainer

        cfg = dataclasses.replace(
            smoke_config,
            train=dataclasses.replace(smoke_config.train, step_chunk=2,
                                      batch_size=8, max_iters=5,
                                      val_freq=100),
        )
        ds = ConformationDataset(
            synthetic_dataset(16, seed=1, min_heavy=3, max_heavy=4))
        tr = Trainer(cfg, ds, None, str(tmp_path / "logs"),
                     mesh=make_mesh(8), log_freq=2)
        state = tr.train()
        assert int(state.step) == 5  # 2 + 2 + 1 (remainder single)
