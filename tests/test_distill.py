"""Progressive distillation (train/distill.py, cli/distill.py).

The reference has no few-step sampling (scripts/test.py always runs the
full Langevin loop); distillation is validated here as an extension:
ladder geometry, loss semantics against hand-rolled teacher rollouts,
optimization progress, chunked-step equivalence, and CLI end-to-end
producing a checkpoint the stock generation stack can sample.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from agdiff_tpu.config import Config, ModelConfig, TrainConfig
from agdiff_tpu.data.bucketing import pad_molecules
from agdiff_tpu.data.synthetic import synthetic_dataset
from agdiff_tpu.sampling.langevin import SamplerConfig, assemble_drift


@pytest.fixture(scope="module")
def distill_config():
    return Config(
        model=ModelConfig(
            hidden_dim=32, num_convs=2, num_convs_local=2,
            num_diffusion_timesteps=100,
        ),
        train=TrainConfig(batch_size=8),
    )


@pytest.fixture(scope="module")
def teacher(distill_config):
    """A briefly-trained teacher (real gradients, not random init, so the
    drift field is smooth enough for 2-step rollouts)."""
    from agdiff_tpu.train.train_step import create_train_state, make_train_step

    mols = synthetic_dataset(8, seed=0, min_heavy=3, max_heavy=4)
    batch = pad_molecules(mols, 16, batch_size=8)
    model, state = create_train_state(
        distill_config, jax.random.PRNGKey(0), max_nodes=16, batch_size=8
    )
    step = make_train_step(model, distill_config)
    key = jax.random.PRNGKey(1)
    for _ in range(10):
        key, k = jax.random.split(key)
        state, _ = step(state, batch, k)
    return model, state, batch, mols


class TestLadderTriplets:
    def test_matches_sampler_grid(self):
        """The distill grid IS the sampler's 'strided' grid — a student
        trained here is sampled by cli.generate --ladder strided with no
        translation."""
        from agdiff_tpu.train.distill import strided_ladder

        T, n = 100, 8
        expect = np.asarray(jnp.round(jnp.linspace(T - 1, 0, n)), np.int32)
        np.testing.assert_array_equal(strided_ladder(T, n), expect)

    def test_triplet_geometry(self):
        from agdiff_tpu.train.distill import ladder_triplets

        start, mid, nxt = ladder_triplets(100, 8)
        assert start[0] == 99 and start[-1] == 0
        assert nxt[-1] == -1
        np.testing.assert_array_equal(nxt[:-1], start[1:])
        # midpoints strictly between (or equal at the degenerate tail)
        assert (mid <= start).all() and (mid >= nxt).all()
        # strictly decreasing student grid => every step is a real jump
        assert (start[:-1] > start[1:]).all()


class TestDistillStep:
    def test_loss_matches_manual_rollout(self, distill_config, teacher):
        """make_distill_loss == a hand-rolled 2-step teacher DDIM rollout
        with truncated-SNR weighting (fixed timestep index via forced key
        is impractical — instead recompute with the same key and compare)."""
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.train.distill import (ladder_triplets,
                                              make_distill_loss)

        model, state, batch, _ = teacher
        cfg = SamplerConfig(sampling_type="generalized", eta=0.0,
                            ladder="strided", w_global=0.3, clip_local=20.0)
        n_student = 8
        loss_fn = make_distill_loss(model, distill_config, cfg, n_student)
        key = jax.random.PRNGKey(3)
        tv = {"params": state.params, "batch_stats": state.batch_stats}
        got = float(loss_fn(state.params, state.batch_stats, tv, batch, key))

        # manual reference
        diffusion = make_diffusion(distill_config.model)
        sig = np.concatenate([np.asarray(diffusion.sigmas), [0.0]])
        start, mid, nxt = ladder_triplets(diffusion.num_timesteps, n_student)
        kkey, nkey = jax.random.split(key)
        B = batch.num_graphs
        k = np.asarray(jax.random.randint(kkey, (B,), 0, n_student))
        s_i, s_m, s_j = sig[start[k]], sig[mid[k]], sig[nxt[k]]
        noise = np.asarray(
            jax.random.normal(nkey, batch.pos.shape, batch.pos.dtype)
        ) * np.asarray(batch.node_mask)[..., None]
        pos_i = np.asarray(batch.pos) + noise * s_i[:, None, None]

        def drift(pos, sigma):
            out = model.apply(tv, batch.replace(pos=jnp.asarray(pos)),
                              train=False)
            return np.asarray(assemble_drift(
                out, jnp.asarray(pos), jnp.asarray(sigma), cfg))

        eps1 = -drift(pos_i, s_i)
        pos_m = pos_i + (s_m - s_i)[:, None, None] * eps1
        eps2 = -drift(pos_m, s_m)
        pos_j = pos_m + (s_j - s_m)[:, None, None] * eps2
        c = s_j - s_i
        c = np.where(np.abs(c) < 1e-12, 1.0, c)
        eps_t = (pos_j - pos_i) / c[:, None, None]
        eps_s = -drift(pos_i, s_i)
        valid = (np.asarray(batch.node_mask)
                 & np.asarray(batch.graph_mask)[:, None])
        sq = ((eps_s - eps_t) ** 2).sum(-1)
        w = np.maximum(1.0, s_i**2)[:, None]
        want = float((sq * w * valid).sum() / max(valid.sum(), 1))
        assert got == pytest.approx(want, rel=2e-4)

    def test_loss_decreases_and_teacher_frozen(self, distill_config,
                                               teacher):
        from agdiff_tpu.train.distill import make_distill_step
        from agdiff_tpu.train.optimizer import make_optimizer
        from agdiff_tpu.train.train_step import TrainState

        model, tstate, batch, _ = teacher
        cfg = SamplerConfig(sampling_type="generalized", eta=0.0,
                            ladder="strided", w_global=0.3, clip_local=20.0)
        tx = make_optimizer(distill_config.train)
        params = jax.tree_util.tree_map(jnp.copy, tstate.params)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=tstate.batch_stats,
                           opt_state=tx.init(params))
        tv = {"params": tstate.params, "batch_stats": tstate.batch_stats}
        step = make_distill_step(model, distill_config, cfg, n_student=8,
                                 donate=False)
        key = jax.random.PRNGKey(7)
        losses = []
        for _ in range(30):
            key, k = jax.random.split(key)
            state, metrics = step(state, tv, batch, k)
            losses.append(float(metrics.loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        # teacher unchanged, student moved, BN stats frozen
        t_leaf = jax.tree_util.tree_leaves(tv["params"])[0]
        s_leaf0 = jax.tree_util.tree_leaves(tstate.params)[0]
        np.testing.assert_array_equal(np.asarray(t_leaf),
                                      np.asarray(s_leaf0))
        # student moved somewhere in the tree (the first leaf alone may
        # legitimately have zero gradient)
        delta = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.params, tstate.params)
        assert max(jax.tree_util.tree_leaves(delta)) > 0.0
        bn0 = jax.tree_util.tree_leaves(tstate.batch_stats)[0]
        bn1 = jax.tree_util.tree_leaves(state.batch_stats)[0]
        np.testing.assert_array_equal(np.asarray(bn0), np.asarray(bn1))

    def test_chunked_equals_single(self, distill_config, teacher):
        from agdiff_tpu.train.distill import (make_chunked_distill_step,
                                              make_distill_step)
        from agdiff_tpu.train.optimizer import make_optimizer
        from agdiff_tpu.train.train_step import TrainState, stack_batches

        model, tstate, batch, _ = teacher
        cfg = SamplerConfig(sampling_type="generalized", eta=0.0,
                            ladder="strided", w_global=0.3, clip_local=20.0)
        tx = make_optimizer(distill_config.train)

        def fresh():
            params = jax.tree_util.tree_map(jnp.copy, tstate.params)
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              batch_stats=tstate.batch_stats,
                              opt_state=tx.init(params))

        tv = {"params": tstate.params, "batch_stats": tstate.batch_stats}
        key = jax.random.PRNGKey(11)
        keys = jax.random.split(key, 3)

        s1 = fresh()
        step = make_distill_step(model, distill_config, cfg, 8, donate=False)
        for k in keys:
            s1, m1 = step(s1, tv, batch, k)

        s2 = fresh()
        chunked = make_chunked_distill_step(model, distill_config, cfg, 8,
                                            chunk=3, donate=False)
        stacked = stack_batches([batch, batch, batch])
        s2, m2 = chunked(s2, tv, stacked, key)

        assert float(m1.loss) == pytest.approx(float(m2.loss), rel=1e-5)
        a = jax.tree_util.tree_leaves(s1.params)[0]
        b = jax.tree_util.tree_leaves(s2.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


class TestParallelDistill:
    def test_dp_equals_single_device(self, distill_config, teacher):
        """Sharded-batch distill step == single-device step (loss + params),
        same contract as the DP train-step equivalence tests."""
        from agdiff_tpu.parallel import make_mesh
        from agdiff_tpu.parallel.data_parallel import (
            make_parallel_distill_step, shard_graph_batch)
        from agdiff_tpu.train.distill import make_distill_step
        from agdiff_tpu.train.optimizer import make_optimizer
        from agdiff_tpu.train.train_step import TrainState

        model, tstate, batch, _ = teacher
        cfg = SamplerConfig(sampling_type="generalized", eta=0.0,
                            ladder="strided", w_global=0.3, clip_local=20.0)
        tx = make_optimizer(distill_config.train)

        def fresh():
            params = jax.tree_util.tree_map(jnp.copy, tstate.params)
            stats = jax.tree_util.tree_map(jnp.copy, tstate.batch_stats)
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              batch_stats=stats, opt_state=tx.init(params))

        tv = {"params": tstate.params, "batch_stats": tstate.batch_stats}
        key = jax.random.PRNGKey(13)

        s1, _ = fresh(), None
        single = make_distill_step(model, distill_config, cfg, 8,
                                   donate=False)
        s1, m1 = single(s1, tv, batch, key)

        mesh = make_mesh(8)
        par = make_parallel_distill_step(model, distill_config, cfg, 8,
                                         mesh, donate=False)
        s2 = fresh()
        s2, m2 = par(s2, tv, shard_graph_batch(batch, mesh), key)

        # loss + grad_norm equivalence, same contract as the DP train-step
        # tests (test_train_eval.py:244-248) — updated params are NOT
        # compared bitwise: Adam's g/sqrt(v) amplifies f32 reduction-order
        # noise on near-zero gradients
        assert float(m1.loss) == pytest.approx(float(m2.loss), rel=1e-5)
        assert float(m1.grad_norm) == pytest.approx(float(m2.grad_norm),
                                                    rel=1e-4)
        a = np.concatenate([np.ravel(x) for x in
                            jax.tree_util.tree_leaves(s1.params)])
        b = np.concatenate([np.ravel(x) for x in
                            jax.tree_util.tree_leaves(s2.params)])
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=5e-3)


class TestDistillCLI:
    def test_end_to_end_checkpoint_samples(self, tmp_path, distill_config,
                                           teacher):
        """cli.distill on a saved teacher -> stage checkpoints the stock
        inference stack loads and samples few-step."""
        from agdiff_tpu.cli.distill import main as distill_main
        from agdiff_tpu.cli._common import load_inference_bundle
        from agdiff_tpu.models.dualenc import get_model
        from agdiff_tpu.models.schedules import make_diffusion
        from agdiff_tpu.sampling.langevin import build_sampler
        from agdiff_tpu.train.checkpoint import save_checkpoint
        from agdiff_tpu.train.optimizer import plateau_init

        model, tstate, batch, mols = teacher
        tdir = str(tmp_path / "teacher")
        save_checkpoint(tdir, 10, distill_config, tstate,
                        plateau_init(1e-3), plateau_init(1e-3), 1.0,
                        best=True)
        ddir = str(tmp_path / "distill")
        distill_main([
            tdir, "--logdir", ddir, "--stages", "8,4", "--iters", "6",
            "--synthetic", "8", "--val_freq", "3", "--batch_size", "8",
            "--step_chunk", "2", "--seed", "5",
        ])
        assert os.path.isfile(os.path.join(ddir, "STAGES.json"))
        for n in (8, 4):
            stage = os.path.join(ddir, f"stage{n}")
            config, variables, _, _ = load_inference_bundle(stage)
            m = get_model(config.model)
            diffusion = make_diffusion(config.model)
            scfg = SamplerConfig(
                sampling_type="generalized", eta=0.0, ladder="strided",
                n_steps=n, w_global=0.3, clip_local=20.0)
            run = build_sampler(m, diffusion, scfg)
            key = jax.random.PRNGKey(0)
            pos_init = jax.random.normal(key, batch.pos.shape)
            out = run(variables, batch, pos_init, key)
            pos = np.asarray(out.pos)
            assert np.isfinite(pos).all()
            assert not np.asarray(out.nan_flags).any()


class TestDistillResume:
    def test_resume_skips_completed_and_recovers_interrupted(
            self, tmp_path, distill_config, teacher):
        """A completed stage (DONE.json) is skipped on rerun; a stage whose
        DONE marker is missing resumes from its latest checkpoint instead of
        retraining (the tunnel-outage recovery path)."""
        from agdiff_tpu.cli.distill import main as distill_main
        from agdiff_tpu.train.checkpoint import (latest_checkpoint,
                                                 save_checkpoint)
        from agdiff_tpu.train.optimizer import plateau_init

        model, tstate, batch, mols = teacher
        tdir = str(tmp_path / "teacher")
        save_checkpoint(tdir, 10, distill_config, tstate,
                        plateau_init(1e-3), plateau_init(1e-3), 1.0,
                        best=True)
        ddir = str(tmp_path / "distill")
        common = [tdir, "--logdir", ddir, "--iters", "6", "--synthetic", "8",
                  "--val_freq", "3", "--batch_size", "8", "--step_chunk",
                  "2", "--seed", "5"]
        distill_main(common + ["--stages", "8"])
        done8 = os.path.join(ddir, "stage8", "DONE.json")
        assert os.path.isfile(done8)
        ck8, it8 = latest_checkpoint(os.path.join(ddir, "stage8"))
        mtime8 = os.path.getmtime(os.path.join(ck8, "meta.json"))

        # rerun with one more stage: stage8 must be skipped untouched,
        # stage4 trained fresh
        distill_main(common + ["--stages", "8,4"])
        assert os.path.getmtime(
            os.path.join(ck8, "meta.json")) == mtime8
        done4 = os.path.join(ddir, "stage4", "DONE.json")
        assert os.path.isfile(done4)

        # simulate an interruption right before stage4's DONE marker was
        # written: resume must pick up its latest checkpoint (already at
        # --iters) and finish without retraining stage8 or stage4
        os.remove(done4)
        ck4, _ = latest_checkpoint(os.path.join(ddir, "stage4"))
        mtime4 = os.path.getmtime(os.path.join(ck4, "meta.json"))
        distill_main(common + ["--stages", "8,4"])
        assert os.path.isfile(done4)
        assert os.path.getmtime(os.path.join(ck4, "meta.json")) == mtime4
        assert os.path.isfile(os.path.join(ddir, "STAGES.json"))


class TestLossWeighting:
    def test_modes_scale_but_agree_at_sigma_le_1(self, distill_config,
                                                 teacher):
        """'eps' and 'trunc-snr' differ only by the max(1, sigma^2) factor;
        'step' by (sigma_j - sigma_i)^2 — all finite and positive here."""
        from agdiff_tpu.train.distill import make_distill_loss

        model, state, batch, _ = teacher
        cfg = SamplerConfig(sampling_type="generalized", eta=0.0,
                            ladder="strided", w_global=0.3, clip_local=20.0)
        tv = {"params": state.params, "batch_stats": state.batch_stats}
        key = jax.random.PRNGKey(17)
        vals = {}
        for mode in ("trunc-snr", "eps", "step"):
            fn = make_distill_loss(model, distill_config, cfg, 8,
                                   weighting=mode)
            vals[mode] = float(fn(state.params, state.batch_stats, tv,
                                  batch, key))
        assert all(np.isfinite(v) and v >= 0 for v in vals.values()), vals
        # trunc-snr upweights high-noise steps -> never below plain eps
        assert vals["trunc-snr"] >= vals["eps"]

    def test_unknown_mode_raises(self, distill_config, teacher):
        from agdiff_tpu.train.distill import make_distill_loss

        model, _, _, _ = teacher
        cfg = SamplerConfig(sampling_type="generalized", eta=0.0)
        with pytest.raises(ValueError):
            make_distill_loss(model, distill_config, cfg, 8,
                              weighting="bogus")
