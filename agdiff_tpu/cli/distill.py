"""Progressive-distillation CLI (train/distill.py; Salimans & Ho 2022).

Distills a trained diffusion checkpoint into a few-step DDIM student by
halving the sampling ladder stage by stage:

  python -m agdiff_tpu.cli.distill <ckpt_or_logdir> \
      --stages 64,32,16,8 --iters 4000 --synthetic 2048 \
      --synthetic_chem rich --logdir /tmp/distill

Each stage writes a normal training checkpoint under
<logdir>/stage{n}/checkpoints/, so the student samples with the stock
generation CLI:

  python -m agdiff_tpu.cli.generate <logdir>/stage8 --sampling_type \
      generalized --eta 0 --ladder strided --n_steps 8 ...

The drift the student learns is the assembled sampling-time drift under the
flags below (w_global etc.) — generate with the SAME flags. The reference
has no few-step sampling at all (its sampler is a fixed 5000-iteration
Langevin loop, dualenc.py:441-547); this is capability beyond it.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time


def main(argv=None):
    from agdiff_tpu.cli._common import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", help="teacher: log dir or checkpoint path")
    ap.add_argument("--ckpt_iter", type=int, default=None)
    ap.add_argument("--logdir", default="./distill_logs")
    ap.add_argument("--stages", default="64,32,16,8",
                    help="comma-separated student step counts; each stage's "
                         "teacher ladder is 2x its own (the previous "
                         "stage's student, or the base ckpt for the first)")
    ap.add_argument("--iters", type=int, default=4000,
                    help="optimizer iterations per stage")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--batch_size", type=int, default=None,
                    help="default: config.train.batch_size")
    ap.add_argument("--step_chunk", type=int, default=None,
                    help="K optimizer steps per device dispatch "
                         "(default: config.train.step_chunk)")
    ap.add_argument("--val_freq", type=int, default=500)
    ap.add_argument("--ema_teacher", action="store_true",
                    help="start from the checkpoint's EMA shadow weights")
    ap.add_argument("--dtype", default=None,
                    choices=[None, "float32", "bfloat16"])
    # dataset (matches cli.train)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--synthetic_rigid", action="store_true")
    ap.add_argument("--synthetic_heavy", type=int, default=None)
    ap.add_argument("--synthetic_chem", default="tree",
                    choices=["tree", "rich"])
    ap.add_argument("--synthetic_confs", type=int, default=1,
                    help="conformers per synthetic molecule (distinct "
                         "torsion conformers as separate datapoints, "
                         "matching cli.train)")
    ap.add_argument("--train_set", default=None,
                    help="npz dataset (instead of --synthetic)")
    ap.add_argument("--seed", type=int, default=2021)
    # the sampling-protocol drift the student regresses
    # (defaults = the validated generation protocol of this repo's
    # rehearsals; generate with the same flags)
    ap.add_argument("--w_global", type=float, default=0.3)
    ap.add_argument("--global_start_sigma", type=float, default=0.5)
    ap.add_argument("--clip", type=float, default=1000.0)
    ap.add_argument("--clip_local", type=float, default=20.0)
    ap.add_argument("--weighting", default="trunc-snr",
                    choices=["trunc-snr", "eps", "step"],
                    help="per-step loss weight (train/distill.py "
                         "make_distill_loss docstring)")
    ap.add_argument("--no_resume", action="store_true",
                    help="retrain every stage from scratch even when "
                         "<logdir>/stage{n} already holds checkpoints. By "
                         "default completed stages (DONE.json) are skipped "
                         "and an interrupted stage restarts from its latest "
                         "checkpoint (the data order and noise draws restart "
                         "from scratch; only the optimizer state resumes).")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from agdiff_tpu.cli._common import load_inference_bundle
    from agdiff_tpu.data.dataset import (BucketedLoader,
                                         ConformationDataset, prefetch)
    from agdiff_tpu.models.dualenc import get_model
    from agdiff_tpu.sampling.langevin import SamplerConfig
    from agdiff_tpu.train.checkpoint import (latest_checkpoint,
                                             load_best, load_checkpoint,
                                             save_checkpoint)
    from agdiff_tpu.train.distill import (make_chunked_distill_step,
                                          make_distill_eval_step,
                                          make_distill_step)
    from agdiff_tpu.train.optimizer import make_optimizer, plateau_init
    from agdiff_tpu.train.train_step import TrainState, stack_batches
    from agdiff_tpu.utils.logging import get_logger
    from agdiff_tpu.utils.misc import seed_all

    os.makedirs(args.logdir, exist_ok=True)
    logger = get_logger("distill", args.logdir)
    seed_all(args.seed)

    config, teacher_vars, ckpt_path, _ = load_inference_bundle(
        args.ckpt, args.ckpt_iter, args.dtype, logger,
        use_ema=args.ema_teacher)
    logger.info("teacher: %s", ckpt_path)
    # distill hyperparameters into the saved config (records provenance and
    # sets the optimizer the student trains with)
    config = dataclasses.replace(
        config, train=dataclasses.replace(
            config.train,
            optimizer=dataclasses.replace(config.train.optimizer, lr=args.lr),
            ema_decay=0.0,
        ))
    model = get_model(config.model)

    if args.synthetic:
        from agdiff_tpu.data.synthetic import heavy_range, synthetic_dataset

        kw = {}
        if args.synthetic_heavy is not None:
            lo, hi = heavy_range(args.synthetic_heavy)
            kw = dict(min_heavy=lo, max_heavy=hi)
        mols = synthetic_dataset(args.synthetic, seed=args.seed,
                                 rigid=args.synthetic_rigid,
                                 chem=args.synthetic_chem, **kw)
        split = max(1, int(len(mols) * 0.9))
        tr_mols, va_mols = mols[:split], mols[split:]
        if args.synthetic_confs > 1:  # molecule-level split BEFORE expansion
            from agdiff_tpu.data.synthetic import expand_conformers

            tr_mols = expand_conformers(tr_mols, args.synthetic_confs,
                                        seed=args.seed + 1)
            va_mols = expand_conformers(va_mols, args.synthetic_confs,
                                        seed=args.seed + 2)
        train_set = ConformationDataset(tr_mols)
        val_set = ConformationDataset(va_mols)
    else:
        train_set = ConformationDataset(args.train_set)
        val_set = None
    logger.info("train: %d molecules | val: %d", len(train_set),
                len(val_set) if val_set else 0)

    batch_size = args.batch_size or config.train.batch_size
    chunk = args.step_chunk if args.step_chunk is not None \
        else max(1, int(config.train.step_chunk))
    buckets = config.buckets.max_nodes
    needed = train_set.max_num_nodes()
    if needed > max(buckets):
        buckets = tuple(sorted(set(buckets) | {needed}))
    sampler_cfg = SamplerConfig(
        sampling_type="generalized", eta=0.0, ladder="strided",
        w_global=args.w_global, global_start_sigma=args.global_start_sigma,
        clip=args.clip, clip_local=args.clip_local,
    )

    stages = [int(s) for s in args.stages.split(",")]
    tx = make_optimizer(config.train)
    key = jax.random.PRNGKey(args.seed)
    # device-resident ONCE: a host (numpy) teacher would re-transfer every
    # dispatch (~25 ms/array through a remote-chip tunnel, CLAUDE round-2)
    teacher = jax.device_put(teacher_vars)
    summary = []
    resume = not args.no_resume
    for n_student in stages:
        stage_dir = os.path.join(args.logdir, f"stage{n_student}")
        os.makedirs(stage_dir, exist_ok=True)
        done_path = os.path.join(stage_dir, "DONE.json")
        if resume and os.path.exists(done_path):
            # stage already finished in a previous run: its best student
            # becomes this run's teacher, exactly as if it had just trained
            with open(done_path) as fh:
                info = json.load(fh)
            best = load_best(stage_dir)
            teacher = jax.device_put({"params": best["params"],
                                      "batch_stats": best["batch_stats"]})
            summary.append({"stage": n_student,
                            "best_val": info["best_val"],
                            "dir": stage_dir, "resumed": True})
            logger.info("[stage %d] already complete (best val %.6f) — "
                        "skipping", n_student, info["best_val"])
            continue
        logger.info("=== stage: %d student steps (teacher ladder %d) ===",
                    n_student, 2 * n_student)
        # student starts as a COPY of its teacher — params AND batch_stats:
        # the step donates `state` while `teacher` rides along as a second
        # argument, so shared buffers would be f(donate(a), a)
        params = jax.tree_util.tree_map(jnp.copy, teacher["params"])
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=jax.tree_util.tree_map(jnp.copy,
                                               teacher["batch_stats"]),
            opt_state=tx.init(params),
        )
        step1 = make_distill_step(model, config, sampler_cfg, n_student,
                                  weighting=args.weighting)
        stepK = (make_chunked_distill_step(model, config, sampler_cfg,
                                           n_student, chunk,
                                           weighting=args.weighting)
                 if chunk > 1 else None)
        eval_step = make_distill_eval_step(model, config, sampler_cfg,
                                           n_student,
                                           weighting=args.weighting)
        loader = BucketedLoader(train_set, batch_size, buckets,
                                edge_order=config.model.edge_order,
                                seed=args.seed)
        val_loader = (BucketedLoader(val_set, batch_size, buckets,
                                     edge_order=config.model.edge_order,
                                     seed=args.seed, shuffle=False,
                                     drop_last=False)
                      if val_set is not None else None)
        data = prefetch(iter(loader), size=max(2, 2 * chunk))
        # FIXED per-stage eval key: every validation draws the same
        # timesteps/noise, so val losses are comparable across iterations
        # and best-checkpoint selection is not dominated by draw variance
        # (the distill loss varies ~150x across ladder levels under the
        # trunc-snr weighting)
        vkey = jax.random.PRNGKey(args.seed + 7919 * n_student)

        def validate(it, state):
            sums = {"sum_loss": 0.0, "count": 0.0}
            for k, (_, batch) in enumerate(val_loader.epoch_batches()):
                out = eval_step(state, teacher, batch,
                                jax.random.fold_in(vkey, k))
                for name in sums:
                    sums[name] += float(out[name])
            avg = sums["sum_loss"] / max(sums["count"], 1.0)
            logger.info("[stage %d] [Validate] Iter %05d | Loss %.6f",
                        n_student, it, avg)
            return avg

        best_val, best_params = float("inf"), None
        start_it = 1
        if resume:
            try:
                ck_path, ck_it = latest_checkpoint(stage_dir)
            except FileNotFoundError:
                ck_path = None
            if ck_path is not None:
                loaded = load_checkpoint(ck_path, target=state)
                state = TrainState(
                    step=jnp.asarray(loaded["step"], jnp.int32),
                    params=loaded["params"],
                    batch_stats=loaded["batch_stats"],
                    opt_state=loaded["opt_state"],
                )
                bm = load_best(stage_dir)
                best_val = float(bm["avg_val_loss"])
                best_params = jax.device_put(
                    jax.tree_util.tree_map(jnp.asarray, bm["params"]))
                start_it = ck_it + 1
                logger.info("[stage %d] resuming from iter %d (best val "
                            "%.6f)", n_student, ck_it, best_val)
        t0, it = time.time(), start_it
        while it <= args.iters:
            k = min(chunk, args.iters - it + 1)
            group = [next(data) for _ in range(k)]
            key, skey = jax.random.split(key)
            if stepK is not None and k == chunk and len(
                {bucket for bucket, _ in group}
            ) == 1:
                stacked = stack_batches([b for _, b in group])
                state, metrics = stepK(state, teacher, stacked, skey)
            else:
                for _, batch in group:
                    key, skey = jax.random.split(key)
                    state, metrics = step1(state, teacher, batch, skey)
            prev, it = it, it + k - 1
            if it // 200 != (prev - 1) // 200 or prev == 1:
                logger.info(
                    "[stage %d] Iter %05d | Loss %.5f | Grad %.3f | %.1f it/s",
                    n_student, it, float(metrics.loss),
                    float(metrics.grad_norm),
                    200 / max(time.time() - t0, 1e-9))
                t0 = time.time()
            if val_loader is not None and (
                it // args.val_freq != (prev - 1) // args.val_freq
                or it == args.iters
            ):
                avg = validate(it, state)
                best = avg < best_val
                if best:
                    best_val = avg
                    # device-resident snapshot (jnp.copy, not np.asarray):
                    # this becomes the next stage's teacher and must not
                    # re-transfer every dispatch; copy so later donated
                    # updates of `state` cannot touch it
                    best_params = jax.tree_util.tree_map(jnp.copy,
                                                         state.params)
                save_checkpoint(stage_dir, it, config, state,
                                plateau_init(args.lr), plateau_init(args.lr),
                                avg, best=best)
            it += 1
        if val_loader is None:
            save_checkpoint(stage_dir, args.iters, config, state,
                            plateau_init(args.lr), plateau_init(args.lr),
                            float("nan"), best=True)
        # the next stage's teacher is this stage's best student
        final_params = (best_params if best_params is not None
                        else state.params)
        teacher = {"params": final_params,
                   "batch_stats": state.batch_stats}
        with open(done_path, "w") as fh:
            json.dump({"stage": n_student, "best_val": best_val,
                       "iters": args.iters}, fh)
        summary.append({"stage": n_student, "best_val": best_val,
                        "dir": stage_dir})
        logger.info("[stage %d] done | best val %.6f -> %s",
                    n_student, best_val, stage_dir)

    with open(os.path.join(args.logdir, "STAGES.json"), "w") as fh:
        json.dump({"stages": summary, "weighting": args.weighting,
                   "sampler": dataclasses.asdict(sampler_cfg)}, fh, indent=1)
    logger.info("distillation complete: %s", args.logdir)


if __name__ == "__main__":
    main()
